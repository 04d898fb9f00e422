"""Checkpoint/resume: a restored trainer continues bit-identically."""

import os

import numpy as np

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs.trap import TrapEnv
from dfd_tpu.models import DiscreteMLP
from dfd_tpu.ops import distances
from dfd_tpu.runners import VectorizedTrainer
from dfd_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from dfd_tpu.utils.metrics import EpochReporter


def _trainer(seed=5):
    cfg = TrainConfig(
        batch_size=8, learning_rate=0.05, noise_std=0.05, zeta_size=8,
        max_strategy_history_size=4, random_seed=seed,
    )
    return VectorizedTrainer(
        DiscreteMLP(2, 9), TrapEnv(), distances.categorical_tvd, cfg,
        reporter=EpochReporter(quiet=True),
    )


def test_checkpoint_resume_is_bit_identical(tmp_path):
    path = os.path.join(tmp_path, "ckpt.npz")

    a = _trainer()
    a.train(3)
    save_checkpoint(path, a)
    a.train(2)

    b = _trainer()
    load_checkpoint(path, b)
    assert int(b.state.epoch) == 3
    b.train(2)

    np.testing.assert_array_equal(np.asarray(a.state.flat), np.asarray(b.state.flat))
    assert a.cumulative_timesteps == b.cumulative_timesteps
    ra = [r["Noisy Reward"] for r in a.reporter.history[-2:]]
    rb = [r["Noisy Reward"] for r in b.reporter.history[-2:]]
    np.testing.assert_array_equal(ra, rb)


def test_checkpoint_restores_archive(tmp_path):
    path = os.path.join(tmp_path, "ckpt.npz")
    a = _trainer()
    a.train(4)
    n_points = len(a.handler.archive)
    save_checkpoint(path, a)

    b = _trainer(seed=99)  # different fresh state everywhere
    load_checkpoint(path, b)
    assert len(b.handler.archive) == n_points
    np.testing.assert_allclose(
        b.handler.strategy_tensor, a.handler.strategy_tensor, atol=1e-6
    )
    assert b.handler.archive.worst_point_idx == a.handler.archive.worst_point_idx


def test_checkpoint_file_is_atomic(tmp_path):
    path = os.path.join(tmp_path, "ckpt.npz")
    a = _trainer()
    a.train(1)
    save_checkpoint(path, a)
    save_checkpoint(path, a)  # overwrite in place
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")
