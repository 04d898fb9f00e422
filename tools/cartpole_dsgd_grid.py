"""CartPole DSGD stall grid: the measurement behind the cartpole_sgd band.

The round-3 CartPole band PASS was a matched stall under the reference's
DSGD defaults.  Before switching the learning-band run to the reference's
pluggable ``opt_fn`` (run_sequential.py:19) with torch SGD, round 4
measured whether ANY corner of the reference's own sweep ranges
(run_server.py:266-276: lr in [0.005..0.1], noise_std in [0.005..0.1],
batch in [10..100]) makes DSGD learn CartPole at band-scale budgets.
Verdict (re-runnable here): every corner stalls at the ~20-26 starting
plateau — DSGD's fixed-norm step ``lr*sqrt(d)*scale(omega)`` is either a
multiple of ||theta|| (large lr) or directionless against CartPole's
cliff-shaped fitness at these populations (small lr) — while plain SGD at
lr 2.0 / batch 128 learns decisively (see ref_band.json cartpole_sgd).

Usage: python tools/cartpole_dsgd_grid.py   (CPU; ~20 min)
One JSON line per corner.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs import CartPoleEnv
from dfd_tpu.models import DiscreteMLP
from dfd_tpu.ops import distances
from dfd_tpu.runners import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter

# the probed corners of the reference sweep grid (round 4): lr extremes x
# sigma extremes x batch extremes, plus the longer-budget mid points
GRID = [
    # (lr, sigma, batch, epochs)
    (0.1, 0.1, 16, 80),
    (0.1, 0.05, 16, 80),
    (0.075, 0.1, 16, 80),
    (0.1, 0.1, 50, 80),
    (0.005, 0.05, 16, 160),
    (0.01, 0.05, 16, 160),
    (0.005, 0.025, 16, 160),
    (0.025, 0.05, 100, 200),
]


def main():
    for lr, sigma, batch, epochs in GRID:
        rep = EpochReporter(quiet=True)
        cfg = TrainConfig(batch_size=batch, learning_rate=lr, noise_std=sigma,
                          zeta_size=32, max_strategy_history_size=16,
                          random_seed=0)
        tr = VectorizedTrainer(DiscreteMLP(4, 2), CartPoleEnv(),
                               distances.categorical_tvd, cfg, reporter=rep)
        tr.train(epochs)
        h = rep.history
        tail = float(np.mean([r["Noisy Reward"] for r in h[-epochs // 4:]]))
        print(json.dumps({
            "opt": "dsgd", "lr": lr, "sigma": sigma, "batch": batch,
            "epochs": epochs,
            "first_noisy": round(h[0]["Noisy Reward"], 1),
            "tail_noisy": round(tail, 1),
            "stalled": bool(tail < 40),
        }), flush=True)


if __name__ == "__main__":
    main()
