"""Benchmark suite: aggregate env-steps/s of vectorized FD population
evaluation across the four policy families.

Each config runs the full training pipeline (population perturb + rollout +
novelty + eval + combine + DSGD + omega/zeta/stats) as chained jitted epochs
on the default platform (the real TPU chip under the driver).

Baseline: the driver north star is >= 1,000,000 env-steps/s aggregate on a
TPU v4-16 (8 chips) => 125,000 steps/s/chip.  ``vs_baseline`` is measured
steps/s on this single chip divided by that per-chip target.

Output contract: ONE JSON line.  The headline metric stays the round-1
whole-pipeline MLP number (so BENCH_r*.json stays comparable across rounds);
the ``suite`` field carries all four family measurements so the hard cases
are recorded too (Gaussian-MLP control, pixel CNN, IMPALA ResNet+LSTM).
"""

import json
import os
import sys
import time

# --mesh N: weak-scaling mode over N virtual CPU devices.  The XLA flag must
# land before jax import; the platform switch (the image pins JAX_PLATFORMS)
# must go through jax.config below.
_MESH_N = None
if "--mesh" in sys.argv:
    _MESH_N = int(sys.argv[sys.argv.index("--mesh") + 1])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_MESH_N}"
    )

import jax
import jax.numpy as jnp

if _MESH_N is not None:
    jax.config.update("jax_platforms", "cpu")

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs.pixelgrid import PixelGridEnv
from dfd_tpu.envs.procmaze import ProcMazeEnv
from dfd_tpu.envs.swimmer import SwimmerEnv
from dfd_tpu.envs.trap import TrapEnv
from dfd_tpu.models import DiscreteMLP, GaussianMLP
from dfd_tpu.models.atari import AtariCNN
from dfd_tpu.models.impala import ImpalaPolicy
from dfd_tpu.ops import distances
from dfd_tpu.runners.vectorized import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter

PER_CHIP_TARGET = 1_000_000 / 8  # north-star aggregate over a v4-16


def _sync(x) -> float:
    """Force a host readback of a device scalar.  On the tunneled backend
    ``jax.block_until_ready`` can acknowledge before device completion, so
    timing must close with a value transfer the relay cannot fake."""
    return float(jax.device_get(jnp.sum(x)))


def bench_config(name, model, env, distance_fn, cfg, n_epochs, mesh=None):
    """Steady-state steps/s of chained jitted epochs (host out of the loop)."""
    tr = VectorizedTrainer(model, env, distance_fn, cfg, mesh=mesh,
                           reporter=EpochReporter(quiet=True))
    archive, count = tr._archive_inputs()
    state, _ = tr._step(tr.state, archive, count)  # warmup / compile
    _sync(state.flat)

    timesteps = []
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        state, metrics = tr._step(state, archive, count)
        timesteps.append(metrics["_timesteps"])
    _sync(state.flat)
    dt = time.perf_counter() - t0
    steps_total = int(sum(int(t) for t in timesteps))
    steps_per_s = steps_total / dt
    print(
        f"[bench:{name}] {steps_total} env-steps in {dt:.2f}s over {n_epochs} epochs "
        f"-> {steps_per_s:,.0f} steps/s",
        file=sys.stderr,
    )
    return steps_per_s


def main_mesh(n_devices: int):
    """Weak-scaling HARNESS over virtual CPU devices: population P = 256 x n
    with the trap MLP config, sharded over an n-device ``Mesh(("pop",))``.

    Caveat (reported in the output): virtual devices share ONE host's cores,
    and the n=1 XLA:CPU program already parallelizes across all of them — so
    these numbers validate the sharded program's functionality and bound its
    multi-device dispatch/collective overhead; they CANNOT demonstrate
    hardware weak scaling.  The >= 85 % 1 -> N-host north-star check
    (BASELINE.md) runs this same trainer on a real slice via
    tools/scaling_slice.py."""
    from dfd_tpu.parallel import make_pop_mesh

    devices = jax.devices()
    assert len(devices) >= n_devices, (len(devices), n_devices)
    base_p = 256
    rows = {}
    n = 1
    while n <= n_devices:
        mesh = make_pop_mesh(devices[:n]) if n > 1 else None
        rows[n] = bench_config(
            f"mesh{n}",
            DiscreteMLP(2, 9),
            TrapEnv(),
            distances.categorical_tvd,
            TrainConfig(batch_size=base_p * n, learning_rate=0.05, noise_std=0.05,
                        zeta_size=64, max_strategy_history_size=16, random_seed=0,
                        scan_unroll=8),
            n_epochs=6,
            mesh=mesh,
        )
        n *= 2
    top = max(rows)
    print(
        json.dumps(
            {
                "metric": f"fd_eval_mesh_harness_steps_per_s_{top}dev",
                "value": round(rows[top], 1),
                "unit": "env-steps/s (P=256 x n sharded over n VIRTUAL cpu devices)",
                "vs_baseline": None,
                "note": (
                    "virtual devices share one host's cores (n=1 already uses"
                    " them all): validates sharded functionality + dispatch"
                    " overhead, not hardware scaling — see"
                    " tools/scaling_slice.py for the real-slice check"
                ),
                "suite": {f"steps_per_s_{n}dev": round(v, 1) for n, v in rows.items()},
            }
        )
    )


def main():
    suite = {}

    # [0] discrete MLP on the trap env — the round-1 headline config
    suite["mlp_trap"] = bench_config(
        "mlp_trap",
        DiscreteMLP(2, 9),
        TrapEnv(),
        distances.categorical_tvd,
        TrainConfig(batch_size=2048, learning_rate=0.05, noise_std=0.05,
                    zeta_size=64, max_strategy_history_size=16, random_seed=0,
                    scan_unroll=8),
        n_epochs=30,
    )

    # [0b] same family at the peak pipeline operating point: E=8 episodes
    # averaged per member multiplies frames-per-dispatch on the latency-bound
    # small-model path (measured sweep: E=1/2/4/8/16 -> 25/40/55/70/78M;
    # knee at E=8).  Fitness semantics: level-luck-averaged (the reference's
    # single-episode fitness is the E=1 headline row above).
    suite["mlp_trap_e8"] = bench_config(
        "mlp_trap_e8",
        DiscreteMLP(2, 9),
        TrapEnv(),
        distances.categorical_tvd,
        TrainConfig(batch_size=2048, learning_rate=0.05, noise_std=0.05,
                    zeta_size=64, max_strategy_history_size=16, random_seed=0,
                    scan_unroll=8, envs_per_perturbation=8),
        n_epochs=12,
    )

    # [2] Gaussian MLP on the JAX-native swimmer (16-obs/6-action locomotion)
    # P=512 is the measured single-chip sweet spot (round-2 sweep: 1.29M/1.50M/
    # 1.50M/1.46M steps/s at P=256/512/1024/2048).
    suite["gaussian_swimmer"] = bench_config(
        "gaussian_swimmer",
        GaussianMLP(16, 6),
        SwimmerEnv(max_steps=100),
        distances.gaussian_wasserstein_from_strategies,
        TrainConfig(batch_size=512, zeta_size=16, max_strategy_history_size=8,
                    episode_length=100, random_seed=0, normalize_obs=True),
        n_epochs=10,
    )

    # [3] Atari CNN on the pixel grid (deepmind-style 0-1 frames); P=256 is the
    # measured sweet spot (183k/215k/190k steps/s at P=128/256/512).
    # compute_dtype=bf16 (round 5): bf16 GEMM operands with f32 accumulation
    # halve the im2col HBM traffic — 288.8k steps/s measured on this exact
    # config (round5_session.jsonl 'cnn' bf16 row) vs the 220.9k the f32 row
    # recorded in BENCH_r04 (+31%); same lever as impala_prod_bf16.  (The
    # session's own f32 base reading, 74.5k, is an outlier — first variant
    # after the IMPALA sweep in the same process; r4's driver-run 220.9k is
    # the trustworthy f32 number for this config.)
    env_cnn = PixelGridEnv(grid=8, scale=8, max_steps=40, intensity=1.0)
    suite["cnn_pixelgrid"] = bench_config(
        "cnn_pixelgrid",
        AtariCNN((64, 64), env_cnn.n_actions, in_channels=3,
                 compute_dtype=jnp.bfloat16),
        env_cnn,
        distances.categorical_tvd,
        TrainConfig(batch_size=256, zeta_size=16, max_strategy_history_size=8,
                    episode_length=40, random_seed=0),
        n_epochs=10,
    )

    # [4] IMPALA ResNet+LSTM on the procgen-shaped maze (the flagship);
    # P=128 measured marginally ahead of 64/256 (20.0k/20.7k/17.9k).
    # conv_impl="fused_feat" (round 5): the VMEM-resident feature block
    # (BN -> 3x3 conv -> maxpool) on top of the fused res pairs — measured
    # +16% over patches at reference widths once HW-characterized
    # (25.8k vs 22.3k on the P=64 pixelgrid probe, round5_session.jsonl).
    env_imp = ProcMazeEnv(grid=8, scale=8, max_steps=40, num_levels=200)
    suite["impala_procmaze"] = bench_config(
        "impala_procmaze",
        ImpalaPolicy(env_imp.obs_shape, env_imp.n_actions, conv_impl="fused_feat"),
        env_imp,
        distances.categorical_tvd,
        TrainConfig(batch_size=128, zeta_size=8, max_strategy_history_size=4,
                    episode_length=40, random_seed=0),
        n_epochs=10,
    )

    # [4b] production-width IMPALA (64/128/128 channels, hidden 512, bf16
    # MXU contractions, 7.9M params — ~13x the parity model's conv FLOPs):
    # the operating point where the 128x128 systolic array actually engages
    # (docs/RESULTS.md roofline: 16/32/32 fills 12.5% of the MXU lanes).
    # conv_impl="fused_feat" (round 5) = the VMEM-resident residual-pair
    # kernel PLUS the fused feature block (ops/fused_resblock.py): the
    # feature block kills the feat conv's im2col patches tensor (the
    # dense-path HBM wall) — measured 11.4k vs 9.8k (fused) vs 5.6k
    # (patches) env-steps/s at this exact config (round5_session.jsonl).
    suite["impala_prod_bf16"] = bench_config(
        "impala_prod_bf16",
        ImpalaPolicy(env_imp.obs_shape, env_imp.n_actions,
                     compute_dtype=jnp.bfloat16, channels=(64, 128, 128),
                     hidden=512, conv_impl="fused_feat"),
        env_imp,
        distances.categorical_tvd,
        TrainConfig(batch_size=64, zeta_size=8, max_strategy_history_size=4,
                    episode_length=40, random_seed=0),
        n_epochs=6,
    )

    headline = suite["mlp_trap"]
    print(
        json.dumps(
            {
                "metric": "fd_eval_env_steps_per_s_single_chip",
                "value": round(headline, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(headline / PER_CHIP_TARGET, 3),
                "suite": {k: round(v, 1) for k, v in suite.items()},
                "suite_vs_per_chip_target": {
                    k: round(v / PER_CHIP_TARGET, 3) for k, v in suite.items()
                },
                # the north star is 1M env-steps/s AGGREGATE over a v4-16
                # (8 chips).  Population FD is embarrassingly parallel over
                # members (returns-only cross-chip traffic, psum combine);
                # the x8 extrapolation assumes the >=85% scaling the mesh
                # harness (--mesh) validates functionally and
                # tools/scaling_slice.py measures on a real slice.
                "suite_x8_chips_extrapolated": {
                    k: round(v * 8, 1) for k, v in suite.items()
                },
                "suite_x8_vs_1M_aggregate": {
                    k: round(v * 8 / 1_000_000, 3) for k, v in suite.items()
                },
            }
        )
    )


if __name__ == "__main__":
    if _MESH_N is not None:
        main_mesh(_MESH_N)
    else:
        main()
