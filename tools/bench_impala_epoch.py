"""Full-epoch IMPALA trainer throughput across conv lowerings, P, widths.

Usage: python tools/bench_impala_epoch.py [impl=patches,lax] [P=64,256] [widths=ref]
       widths: ref (16/32/32 h256) | prod (64/128/128 h512)
       impl may carry a +bf16 suffix, e.g. fused+bf16
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs.pixelgrid import PixelGridEnv
from dfd_tpu.models.impala import ImpalaPolicy
from dfd_tpu.ops import distances
from dfd_tpu.runners.vectorized import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter

HORIZON = 40
WIDTHS = {"ref": ((16, 32, 32), 256), "prod": ((64, 128, 128), 512)}


def _sync(x):
    # the tunneled backend can acknowledge block_until_ready before device
    # completion; a scalar readback cannot be faked
    return float(jax.device_get(jnp.sum(x)))


def bench(impl, P, widths="ref", n=5):
    impl, _, suffix = impl.partition("+")
    cd = jnp.bfloat16 if suffix == "bf16" else None
    channels, hidden = WIDTHS[widths]
    env = PixelGridEnv(grid=8, scale=8)
    model = ImpalaPolicy((3, 64, 64), env.n_actions, conv_impl=impl,
                         channels=channels, hidden=hidden, compute_dtype=cd)
    cfg = TrainConfig(batch_size=P, zeta_size=8, max_strategy_history_size=4,
                      episode_length=HORIZON, random_seed=0)
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                           reporter=EpochReporter(quiet=True))
    archive, count = tr._archive_inputs()
    t0 = time.perf_counter()
    state, _ = tr._step(tr.state, archive, count)
    _sync(state.flat)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = tr._step(state, archive, count)
    _sync(state.flat)
    dt = (time.perf_counter() - t0) / n
    steps = HORIZON * (P + 1)  # population + eval episode
    tag = impl + ("+bf16" if cd is not None else "")
    print(f"impl={tag:12s} P={P:5d} {widths}: {dt*1e3:8.1f} ms/epoch -> "
          f"{steps/dt:10,.0f} env-steps/s  (compile {compile_s:.0f}s)", flush=True)
    return steps / dt


def main():
    impls = (sys.argv[1] if len(sys.argv) > 1 else "patches,lax").split(",")
    Ps = [int(p) for p in (sys.argv[2] if len(sys.argv) > 2 else "64,256").split(",")]
    widths = sys.argv[3] if len(sys.argv) > 3 else "ref"
    for impl in impls:
        for P in Ps:
            bench(impl, P, widths)


if __name__ == "__main__":
    main()


def bench_E(impl, P, E, n=5):
    env = PixelGridEnv(grid=8, scale=8)
    model = ImpalaPolicy((3, 64, 64), env.n_actions, conv_impl=impl)
    cfg = TrainConfig(batch_size=P, zeta_size=8, max_strategy_history_size=4,
                      episode_length=HORIZON, random_seed=0, envs_per_perturbation=E)
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                           reporter=EpochReporter(quiet=True))
    archive, count = tr._archive_inputs()
    t0 = time.perf_counter()
    state, _ = tr._step(tr.state, archive, count)
    jax.block_until_ready(state.flat)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = tr._step(state, archive, count)
    jax.block_until_ready(state.flat)
    dt = (time.perf_counter() - t0) / n
    steps = HORIZON * (P * E + 1)
    print(f"impl={impl:8s} P={P:4d} E={E:2d}: {dt*1e3:8.1f} ms/epoch -> "
          f"{steps/dt:10,.0f} env-steps/s  (compile {compile_s:.0f}s)")
