"""Long-budget soak: the reference server's default 50M-timestep run
(reference run_server.py:25 ``timestep_limit=50_000_000``) end-to-end on one
chip, with a mid-run checkpoint/restart whose resumed trajectory must be
bit-identical — guarding the fast-dispatch/checkpoint interaction no short
test exercises (round-4 item 9).

Family: the pixel CNN (config [3] proxy — AtariCNN on the 64px PixelGrid),
chosen because its measured ~218k env-steps/s makes 50M steps a meaningful
soak duration (minutes, thousands of epochs) rather than seconds.

Protocol:
  1. train to 25M cumulative timesteps (chunked fast dispatch);
  2. save a checkpoint; build a FRESH trainer and restore into it;
  3. run N epochs on both; assert parameter trajectories are IDENTICAL;
  4. the restored trainer continues to 50M;
  5. one JSON line: sustained env-steps/s for each half + the equality.

Usage: python tools/soak_run.py [timestep_limit]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs.pixelgrid import PixelGridEnv
from dfd_tpu.models.atari import AtariCNN
from dfd_tpu.ops import distances
from dfd_tpu.runners import VectorizedTrainer
from dfd_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from dfd_tpu.utils.metrics import EpochReporter

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "curves")


def _sync(tr):
    return float(jax.device_get(jnp.sum(tr.state.flat)))


def make_trainer():
    env = PixelGridEnv(grid=8, scale=8, channels=3, max_steps=40, intensity=1.0)
    model = AtariCNN((env.obs_shape[1], env.obs_shape[2]), env.n_actions,
                     in_channels=env.obs_shape[0])
    cfg = TrainConfig(batch_size=256, learning_rate=0.01, noise_std=0.05,
                      zeta_size=8, max_strategy_history_size=8, random_seed=0,
                      episode_length=40)
    return VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                             reporter=EpochReporter(quiet=True))


def main():
    limit = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    half = limit // 2
    # name matches the docs/curves/*.ckpt.npz ignore rule: the 11 MB binary
    # stays out of git; docs/curves/soak_ckpt.meta.json records its hash
    ckpt = os.path.join(OUT, "soak.ckpt.npz")

    tr = make_trainer()
    t0 = time.time()
    tr.train_to_timesteps(half, sync_every=50)
    _sync(tr)
    t_first = time.time() - t0
    steps_first = tr.cumulative_timesteps
    save_checkpoint(ckpt, tr)

    # fresh trainer (fresh jit caches, fresh archive object) from the file
    tr2 = make_trainer()
    load_checkpoint(ckpt, tr2)
    assert tr2.cumulative_timesteps == steps_first

    # bit-identical resume: the original and the restored trainer must take
    # exactly the same trajectory from the checkpoint
    tr.train_fast(30, sync_every=10)
    tr2.train_fast(30, sync_every=10)
    a, b = np.asarray(tr.state.flat), np.asarray(tr2.state.flat)
    identical = bool(np.array_equal(a, b))
    max_dev = float(np.max(np.abs(a - b))) if not identical else 0.0

    # the restored trainer carries the run to the full budget
    t1 = time.time()
    tr2.train_to_timesteps(limit, sync_every=50)
    _sync(tr2)
    t_second = time.time() - t1
    steps_second = tr2.cumulative_timesteps - steps_first

    hist = tr2.reporter.history
    print(json.dumps({
        "run": "soak_50M_cnn_pixelgrid",
        "timestep_limit": limit,
        "steps_first_half": steps_first,
        "steps_per_s_first_half": round(steps_first / t_first, 1),
        "steps_per_s_second_half": round(steps_second / t_second, 1),
        "epochs_total": int(tr2.state.epoch),
        "resume_bit_identical": identical,
        "resume_max_abs_dev": max_dev,
        "final_noisy_reward": round(hist[-1]["Noisy Reward"], 3),
        "final_eval_ema": round(hist[-1]["Policy Reward"], 3),
        "wall_s_total": round(t_first + t_second, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
