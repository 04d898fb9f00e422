"""Benchmark: aggregate env-steps/s of vectorized FD population evaluation.

Runs the full jitted epoch step (population perturb + rollout + novelty +
eval + combine + DSGD) of the vectorized trainer on the default platform
(the real TPU chip under the driver) and reports one JSON line.

Baseline: the driver north star is >= 1,000,000 env-steps/s aggregate on a
TPU v4-16 (8 chips) => 125,000 steps/s/chip.  ``vs_baseline`` is measured
steps/s on this single chip divided by that per-chip target.
"""

import json
import time

import jax
import numpy as np

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
    )
    model = DiscreteMLP(2, 9)
    env = TrapEnv()
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                           reporter=EpochReporter(quiet=True))

    # warmup / compile
    archive, count = tr._archive_inputs()
    state, metrics, _, _ = tr._step(tr.state, archive, count)
    jax.block_until_ready(state.flat)

    n_iters = 10
    steps_total = 0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics, _, _ = tr._step(state, archive, count)
        steps_total += int(metrics["_timesteps"])
    jax.block_until_ready(state.flat)
    dt = time.perf_counter() - t0

    steps_per_s = steps_total / dt
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
