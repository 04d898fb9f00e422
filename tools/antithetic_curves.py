"""Antithetic-vs-one-sided learning-curve comparison (trap + CartPole).

VERDICT item 1's demonstration: mirrored pairs theta +- sigma*eps halve the
gradient-estimator variance contributed by the even curvature terms; the
visible effect is smoother/faster early learning at equal population budget.
Dumps per-epoch curves to docs/curves/antithetic_{env}_{mode}_{seed}.jsonl
and prints one summary JSON line per run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs import CartPoleEnv, TrapEnv
from dfd_tpu.models import DiscreteMLP
from dfd_tpu.ops import distances
from dfd_tpu.runners import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "curves")
os.makedirs(OUT, exist_ok=True)

ENVS = {
    "trap": dict(
        env=lambda: TrapEnv(), model=lambda: DiscreteMLP(2, 9),
        cfg=dict(batch_size=256, learning_rate=0.05, noise_std=0.05,
                 zeta_size=32, max_strategy_history_size=16),
        epochs=40,
    ),
    "cartpole": dict(
        env=lambda: CartPoleEnv(), model=lambda: DiscreteMLP(4, 2),
        cfg=dict(batch_size=512, learning_rate=2.0, noise_std=0.1,
                 optimizer="sgd", zeta_size=32, max_strategy_history_size=16),
        epochs=80,
    ),
}


def main():
    names = sys.argv[1:] or list(ENVS)
    for name in names:
        spec = ENVS[name]
        for antithetic in (False, True):
            for seed in (0, 1, 2):
                rep = EpochReporter(quiet=True)
                cfg = TrainConfig(random_seed=seed, antithetic=antithetic, **spec["cfg"])
                tr = VectorizedTrainer(
                    spec["model"](), spec["env"](), distances.categorical_tvd, cfg,
                    reporter=rep,
                )
                t0 = time.time()
                tr.train_fast(spec["epochs"], sync_every=10)
                mode = "anti" if antithetic else "onesided"
                rep.dump_jsonl(os.path.join(OUT, f"antithetic_{name}_{mode}_{seed}.jsonl"))
                h = rep.history
                tail = [r["Noisy Reward"] for r in h[-10:]]
                print(json.dumps({
                    "env": name, "mode": mode, "seed": seed,
                    "wall_s": round(time.time() - t0, 1),
                    "first": round(h[0]["Noisy Reward"], 2),
                    "last": round(h[-1]["Noisy Reward"], 2),
                    "tail_mean": round(sum(tail) / len(tail), 2),
                }))


if __name__ == "__main__":
    main()
