"""Full-epoch IMPALA trainer throughput across conv lowerings and P.

Usage: python tools/bench_impala_epoch.py [impl=patches,lax] [P=64,256]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs.pixelgrid import PixelGridEnv
from dfd_tpu.models.impala import ImpalaPolicy
from dfd_tpu.ops import distances
from dfd_tpu.runners.vectorized import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter

HORIZON = 40


def bench(impl, P, n=5):
    env = PixelGridEnv(grid=8, scale=8)
    model = ImpalaPolicy((3, 64, 64), env.n_actions, conv_impl=impl)
    cfg = TrainConfig(batch_size=P, zeta_size=8, max_strategy_history_size=4,
                      episode_length=HORIZON, random_seed=0)
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
    steps = HORIZON * (P + 1)  # population + eval episode
    print(f"impl={impl:8s} P={P:5d}: {dt*1e3:8.1f} ms/epoch -> "
          f"{steps/dt:10,.0f} env-steps/s  (compile {compile_s:.0f}s)")
    return steps / dt


def main():
    impls = (sys.argv[1] if len(sys.argv) > 1 else "patches,lax").split(",")
    Ps = [int(p) for p in (sys.argv[2] if len(sys.argv) > 2 else "64,256").split(",")]
    for impl in impls:
        for P in Ps:
            bench(impl, P)


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
