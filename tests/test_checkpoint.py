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


def test_checkpoint_resume_does_not_duplicate_archive(tmp_path):
    """Resume must not re-submit the current flat as a fresh archive point:
    _last_archived round-trips through the checkpoint, so the warm trainer's
    next train() call sees the guard exactly as the saved trainer did."""
    path = os.path.join(tmp_path, "ckpt.npz")

    def make():
        cfg = TrainConfig(
            batch_size=8, learning_rate=0.05, noise_std=0.05, zeta_size=8,
            max_strategy_history_size=16, random_seed=5,  # archive stays unfull
        )
        return VectorizedTrainer(
            DiscreteMLP(2, 9), TrapEnv(), distances.categorical_tvd, cfg,
            reporter=EpochReporter(quiet=True),
        )

    a = make()
    a.train(3)
    save_checkpoint(path, a)
    a.train(1)

    b = make()
    load_checkpoint(path, b)
    assert b._last_archived is not None
    np.testing.assert_array_equal(b._last_archived, np.asarray(b.state.flat))
    b.train(1)
    assert len(b.handler.archive) == len(a.handler.archive)
    # no distance-0 duplicate pair in the restored-then-trained archive
    flats = [p.flat for p in b.handler.archive.points]
    for i in range(len(flats)):
        for j in range(i + 1, len(flats)):
            assert not np.array_equal(flats[i], flats[j])


def test_checkpoint_file_is_atomic(tmp_path):
    path = os.path.join(tmp_path, "ckpt.npz")
    a = _trainer()
    a.train(1)
    save_checkpoint(path, a)
    save_checkpoint(path, a)  # overwrite in place
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")


def _seq_runner():
    from dfd_tpu.envs.trap import TrapEnv
    from dfd_tpu.ops import distances
    from dfd_tpu.runners import HostEnv, SequentialRunner

    return SequentialRunner(
        DiscreteMLP(2, 9), HostEnv(TrapEnv(), seed=0), distances.categorical_tvd,
        learning_rate=0.05, noise_std=0.05, batch_size=4, random_seed=7,
        zeta_size=10, max_strategy_history_size=10, eval_prob=0.2,
        reporter=EpochReporter(quiet=True),
    )


def test_host_checkpoint_resume_is_exact(tmp_path):
    from dfd_tpu.utils.checkpoint import load_host_checkpoint, save_host_checkpoint

    path = os.path.join(tmp_path, "host.npz")
    a = _seq_runner()
    a.train(2)
    save_host_checkpoint(path, a)
    a.train(2)

    b = _seq_runner()
    load_host_checkpoint(path, b)
    assert b.learner.epoch == 2
    b.train(2)

    np.testing.assert_array_equal(a.learner.flat, b.learner.flat)
    ra = [r["Noisy Reward"] for r in a.reporter.history[-2:]]
    rb = [r["Noisy Reward"] for r in b.reporter.history[-2:]]
    assert ra == rb
    assert a.agent.cumulative_timesteps == b.agent.cumulative_timesteps
    assert a.omega.omega == b.omega.omega


def test_host_checkpoint_server_runner(tmp_path):
    """ServerRunner state round-trips (learner/omega/obs-stats/archive)."""
    from dfd_tpu.runners.server import ServerRunner
    from dfd_tpu.utils.checkpoint import load_host_checkpoint, save_host_checkpoint

    path = os.path.join(tmp_path, "server.npz")
    a = ServerRunner(env_id="SimpleTrapEnv-v0", batch_size=4, zeta_size=4,
                     max_strategy_history_size=4, normalize_obs=True, random_seed=5,
                     port=0, reporter=EpochReporter(quiet=True))
    a.global_obs_stats.update(np.array([0.3, 0.4]))
    a.global_obs_stats.update(np.array([0.5, 0.6]))
    a.learner.flat += 1.0
    a.learner.epoch = 7
    save_host_checkpoint(path, a)

    b = ServerRunner(env_id="SimpleTrapEnv-v0", batch_size=4, zeta_size=4,
                     max_strategy_history_size=4, normalize_obs=True, random_seed=5,
                     port=0, reporter=EpochReporter(quiet=True))
    load_host_checkpoint(path, b)
    np.testing.assert_array_equal(b.learner.flat, a.learner.flat)
    assert b.learner.epoch == 7
    assert b.global_obs_stats.count == a.global_obs_stats.count
    np.testing.assert_array_equal(b.global_obs_stats.mean, a.global_obs_stats.mean)
