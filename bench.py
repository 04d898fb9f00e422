"""Benchmark: aggregate env-steps/s of vectorized FD population evaluation.

Runs the full training pipeline (population perturb + rollout + novelty +
eval + combine + DSGD + omega/zeta/stats) as in-graph scanned epochs on the
default platform (the real TPU chip under the driver) and reports one JSON
line on stdout.

Baseline: the driver north star is >= 1,000,000 env-steps/s aggregate on a
TPU v4-16 (8 chips) => 125,000 steps/s/chip.  ``vs_baseline`` is measured
steps/s on this single chip divided by that per-chip target.
"""

import json
import sys
import time

import jax

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs.trap import TrapEnv
from dfd_tpu.models import DiscreteMLP
from dfd_tpu.ops import distances
from dfd_tpu.runners.vectorized import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter

PER_CHIP_TARGET = 1_000_000 / 8  # north-star aggregate over a v4-16


def main():
    P = 2048
    cfg = TrainConfig(
        batch_size=P,
        learning_rate=0.05,
        noise_std=0.05,
        zeta_size=64,
        max_strategy_history_size=16,
        random_seed=0,
        scan_unroll=8,
    )
    tr = VectorizedTrainer(
        DiscreteMLP(2, 9), TrapEnv(), distances.categorical_tvd, cfg,
        reporter=EpochReporter(quiet=True),
    )

    # warmup / compile
    archive, count = tr._archive_inputs()
    state, metrics = tr._step(tr.state, archive, count)
    jax.block_until_ready(state.flat)

    # steady state: epochs chain through the state dependency; host stays out
    # of the loop (the strategy-archive refresh is amortized in production)
    n_epochs = 30
    timesteps = []
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        state, metrics = tr._step(state, archive, count)
        timesteps.append(metrics["_timesteps"])
    jax.block_until_ready(state.flat)
    dt = time.perf_counter() - t0
    steps_total = int(sum(int(t) for t in timesteps))

    steps_per_s = steps_total / dt
    print(
        f"[bench] {steps_total} env-steps in {dt:.2f}s over {n_epochs} chained jitted epochs "
        f"(P={P}, horizon=201)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "fd_eval_env_steps_per_s_single_chip",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
