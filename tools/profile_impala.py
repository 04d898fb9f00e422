"""Profile the IMPALA flagship population rollout on the real chip.

Round-2 perf sprint (VERDICT item 2): measure where the 9.8k env-steps/s
at P=64 actually goes before optimizing.  Pieces measured:

  1. full trainer epoch step (baseline, as benched in round 1)
  2. population rollout only (no novelty/eval/combine)
  3. torso forward under population vmap (the suspected grouped-conv sink)
  4. torso forward with SHARED weights at the same total frame batch
     (what a non-vmapped conv of identical FLOPs costs)
  5. conv3x3 via patches+einsum under population vmap (batched-GEMM lowering)
  6. env step + welford accumulation without the model

Usage: python tools/profile_impala.py [P]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs.pixelgrid import PixelGridEnv
from dfd_tpu.models.impala import CHANNELS, ImpalaPolicy, conv3x3, maxpool3x3s2
from dfd_tpu.models.atari import batchnorm2d_eval
from dfd_tpu.ops import distances
from dfd_tpu.runners.vectorized import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    env = PixelGridEnv(grid=8, scale=8)
    model = ImpalaPolicy((3, 64, 64), env.n_actions)
    print(f"IMPALA d={model.num_params}, P={P}, frames 3x64x64", file=sys.stderr)

    cfg = TrainConfig(batch_size=P, zeta_size=8, max_strategy_history_size=4,
                      episode_length=40, random_seed=0)
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                           reporter=EpochReporter(quiet=True))

    # 1. full epoch step
    archive, count = tr._archive_inputs()
    dt = timeit(lambda: tr._step(tr.state, archive, count)[0].flat, n=5)
    steps = 40 * P
    print(f"[1] full epoch step: {dt*1e3:.1f} ms -> {steps/dt:,.0f} env-steps/s")

    # pieces share these
    params, bn_state = model.init(0)
    params = jax.tree.map(jnp.asarray, params)
    bn_state = jax.tree.map(jnp.asarray, bn_state)
    flat = jnp.asarray(model.get_flat(params))
    eps = jax.random.normal(jax.random.key(1), (P, model.num_params)) * 0.05
    pop_flats = flat[None] + eps
    pop_params = jax.jit(jax.vmap(lambda v: model.set_flat(v, xp=jnp)))(pop_flats)
    jax.block_until_ready(jax.tree.leaves(pop_params)[0])

    frames = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (P, 3, 64, 64)).astype(np.float32))

    # 3. torso under population vmap (per-member weights)
    torso_vmap = jax.jit(jax.vmap(lambda p, f: model._torso(p, bn_state, f[None])[0]))
    dt3 = timeit(torso_vmap, pop_params, frames)
    print(f"[3] torso vmap(P) per-member weights: {dt3*1e3:.2f} ms -> {P/dt3:,.0f} frames/s")

    # 4. torso with shared weights, same frame batch
    torso_shared = jax.jit(lambda p, f: model._torso(p, bn_state, f))
    dt4 = timeit(torso_shared, params, frames)
    print(f"[4] torso shared weights batch={P}: {dt4*1e3:.2f} ms -> {P/dt4:,.0f} frames/s")

    # 5. patches+einsum conv under vmap: one representative res-block conv
    x16 = jnp.asarray(np.random.RandomState(1).randn(P, 16, 32, 32).astype(np.float32))
    w16 = jnp.asarray(np.random.RandomState(2).randn(P, 16, 16, 3, 3).astype(np.float32) * 0.1)
    b16 = jnp.zeros((P, 16))

    def conv_vmap(x, w, b):
        return jax.vmap(lambda xx, ww, bb: conv3x3({"w": ww, "b": bb}, xx[None])[0])(x, w, b)

    def conv_patches(x, w, b):
        # [P,Cin,H,W] -> patches [P, Cin*9, H, W]; per-member GEMM over k
        pat = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = jnp.einsum("pkhw,pok->pohw", pat, w.reshape(P, 16, -1),
                       preferred_element_type=jnp.float32)
        return y + b[:, :, None, None]

    f_conv_vmap = jax.jit(conv_vmap)
    f_conv_pat = jax.jit(conv_patches)
    dt5a = timeit(f_conv_vmap, x16, w16, b16)
    dt5b = timeit(f_conv_pat, x16, w16, b16)
    # check numerics
    da = f_conv_vmap(x16, w16, b16)
    db = f_conv_pat(x16, w16, b16)
    err = float(jnp.max(jnp.abs(da - db)))
    print(f"[5] res conv 16ch 32x32: vmap-conv {dt5a*1e3:.2f} ms vs patches+einsum {dt5b*1e3:.2f} ms (maxerr {err:.2e})")

    # 5b. bf16 patches+einsum
    def conv_patches_bf16(x, w, b):
        pat = jax.lax.conv_general_dilated_patches(
            x.astype(jnp.bfloat16), (3, 3), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = jnp.einsum("pkhw,pok->pohw", pat,
                       w.reshape(P, 16, -1).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y + b[:, :, None, None]
    dt5c = timeit(jax.jit(conv_patches_bf16), x16, w16, b16)
    print(f"[5b] patches+einsum bf16: {dt5c*1e3:.2f} ms")

    # 6. env+welford only: scan a trivial policy through the env
    from dfd_tpu.fd import rollout as fd_rollout

    class NullModel:
        recurrent = False
        def initial_carry(self):
            return ()
        def act_step(self, p, s, obs, pr, pd, c, k, det):
            return jnp.int32(0), jnp.float32(0), c

    null = NullModel()
    def roll_env_only(keys):
        def one(k):
            return fd_rollout.episode_rollout(
                null, env, None, None, k, 40, deterministic=jnp.asarray(False),
                obs_mean=0.0, obs_std=1.0, normalize_obs=False,
                obs_stats_update_chance=0.01, collect_states=False)
        return jax.vmap(one)(keys).reward
    keys = jax.random.split(jax.random.key(0), P)
    dt6 = timeit(jax.jit(roll_env_only), keys)
    print(f"[6] env+welford only rollout: {dt6*1e3:.2f} ms -> {steps/dt6:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
