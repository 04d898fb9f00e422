"""Run the BASELINE-config learning demonstrations on the current backend
and dump per-epoch curves to docs/curves/*.jsonl."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs import CartPoleEnv, PendulumEnv, TrapEnv
from dfd_tpu.envs.pixelgrid import PixelGridEnv
from dfd_tpu.envs.procmaze import ProcMazeEnv
from dfd_tpu.envs.swimmer import SwimmerEnv
from dfd_tpu.models import DiscreteMLP, GaussianMLP
from dfd_tpu.models.atari import AtariCNN
from dfd_tpu.models.impala import ImpalaPolicy
from dfd_tpu.ops import distances
from dfd_tpu.runners import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "curves")
os.makedirs(OUT, exist_ok=True)

RUNS = {
    "trap_discrete": dict(
        env=TrapEnv(), model=DiscreteMLP(2, 9), dist=distances.categorical_tvd,
        cfg=TrainConfig(batch_size=256, learning_rate=0.05, noise_std=0.05,
                        zeta_size=64, max_strategy_history_size=32, random_seed=3),
        epochs=60,
    ),
    "cartpole_discrete": dict(
        env=CartPoleEnv(), model=DiscreteMLP(4, 2), dist=distances.categorical_tvd,
        # DSGD's norm-capped steps stall CartPole (in the reference semantics
        # too); the ES-style plain-SGD path solves it to the 500 cap
        cfg=TrainConfig(batch_size=512, learning_rate=2.0, noise_std=0.1,
                        optimizer="sgd", zeta_size=32,
                        max_strategy_history_size=16, random_seed=7),
        epochs=160,
    ),
    "pendulum_gaussian": dict(
        env=PendulumEnv(), model=GaussianMLP(3, 1),
        dist=distances.gaussian_wasserstein_from_strategies,
        # like CartPole, the ES-style SGD path is the one that solves it
        cfg=TrainConfig(batch_size=512, learning_rate=1.0, noise_std=0.1,
                        optimizer="sgd", zeta_size=32,
                        max_strategy_history_size=16, random_seed=0),
        epochs=150,
    ),
    "pixelgrid_atari_cnn": dict(
        env=PixelGridEnv(grid=6, scale=6, max_steps=24, intensity=1.0),
        model=AtariCNN((36, 36), 5, in_channels=3), dist=distances.categorical_tvd,
        cfg=TrainConfig(batch_size=128, learning_rate=0.1, noise_std=0.1,
                        zeta_size=16, max_strategy_history_size=8, random_seed=0,
                        episode_length=24),
        epochs=40,
    ),
    "pixelgrid_impala": dict(
        env=PixelGridEnv(grid=4, scale=16, max_steps=16),
        model=ImpalaPolicy((3, 64, 64), 5), dist=distances.categorical_tvd,
        cfg=TrainConfig(batch_size=32, learning_rate=0.1, noise_std=0.1,
                        zeta_size=8, max_strategy_history_size=8, random_seed=0,
                        episode_length=16),
        epochs=20,
    ),
    # config [2] at HalfCheetah-class dimensionality: 16-obs/6-action
    # locomotion on the JAX-native swimmer (contact-free Lagrangian physics)
    "swimmer_gaussian": dict(
        env=SwimmerEnv(max_steps=150), model=GaussianMLP(16, 6),
        dist=distances.gaussian_wasserstein_from_strategies,
        cfg=TrainConfig(batch_size=512, learning_rate=0.5, noise_std=0.1,
                        optimizer="sgd", zeta_size=32,
                        max_strategy_history_size=16, random_seed=0,
                        episode_length=150, normalize_obs=True),
        epochs=120,
    ),
    # config [3]/[4] with procgen-shaped level distribution: procedural
    # layouts + level-keyed palettes force generalization across levels
    "procmaze_impala": dict(
        env=ProcMazeEnv(grid=4, scale=16, max_steps=14, num_levels=5),
        model=ImpalaPolicy((3, 64, 64), 5), dist=distances.categorical_tvd,
        cfg=TrainConfig(batch_size=64, learning_rate=0.1, noise_std=0.1,
                        zeta_size=8, max_strategy_history_size=8, random_seed=0,
                        episode_length=14),
        epochs=60,
    ),
    # flat full-distribution baseline vs the level curriculum, same budget:
    # on a wide distribution each FD member rolls a different layout, so
    # early fitness differences are level luck; the curriculum narrows the
    # early distribution to recover signal (utils/curriculum.py)
    "procmaze_impala_flat200": dict(
        env=ProcMazeEnv(grid=4, scale=16, max_steps=14, num_levels=200),
        model=ImpalaPolicy((3, 64, 64), 5), dist=distances.categorical_tvd,
        cfg=TrainConfig(batch_size=64, learning_rate=0.1, noise_std=0.1,
                        zeta_size=8, max_strategy_history_size=8, random_seed=0,
                        episode_length=14),
        epochs=60,
    ),
    "procmaze_impala_curriculum": dict(
        env=ProcMazeEnv(grid=4, scale=16, max_steps=14, num_levels=1),
        model=ImpalaPolicy((3, 64, 64), 5), dist=distances.categorical_tvd,
        cfg=TrainConfig(batch_size=64, learning_rate=0.1, noise_std=0.1,
                        zeta_size=8, max_strategy_history_size=8, random_seed=0,
                        episode_length=14),
        phases=[(15, 1), (15, 5), (30, 200)],
    ),
}

only = sys.argv[1:] or list(RUNS)
for name in only:
    spec = RUNS[name]
    rep = EpochReporter(quiet=True)
    tr = VectorizedTrainer(spec["model"], spec["env"], spec["dist"], spec["cfg"], reporter=rep)
    t0 = time.time()
    if "phases" in spec:
        from dfd_tpu.utils.curriculum import train_level_curriculum

        train_level_curriculum(tr, spec["phases"], sync_every=10)
    else:
        tr.train_fast(spec["epochs"], sync_every=10)
    wall = time.time() - t0
    rep.dump_jsonl(os.path.join(OUT, f"{name}.jsonl"))
    h = rep.history
    print(json.dumps({
        "run": name,
        "wall_s": round(wall, 1),
        "epochs": len(h),
        "steps": h[-1]["Cumulative Timesteps"],
        "first_reward": round(h[0]["Noisy Reward"], 2),
        "last_reward": round(h[-1]["Noisy Reward"], 2),
        "best_eval_ema": round(max(r["Policy Reward"] for r in h), 2),
    }))
