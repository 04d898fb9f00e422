"""Level curricula: env swap mid-training + the procgen-style level schedule
(utils/curriculum.py, VectorizedTrainer.set_env, ProcMazeEnv.with_levels)."""

import numpy as np
import pytest

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs.procmaze import ProcMazeEnv
from dfd_tpu.envs.trap import TrapEnv
from dfd_tpu.models.atari import AtariCNN
from dfd_tpu.ops import distances
from dfd_tpu.runners.vectorized import VectorizedTrainer
from dfd_tpu.utils.curriculum import train_level_curriculum
from dfd_tpu.utils.metrics import EpochReporter


def _small_trainer(num_levels=2, batch_size=4):
    env = ProcMazeEnv(grid=4, scale=4, max_steps=5, num_levels=num_levels)
    model = AtariCNN(env.obs_shape[1:], env.n_actions, in_channels=3)
    cfg = TrainConfig(batch_size=batch_size, zeta_size=4,
                      max_strategy_history_size=4, episode_length=5,
                      random_seed=0)
    return VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                             reporter=EpochReporter(quiet=True))


def test_with_levels_replays_levels_across_ranges():
    """A level id generates the identical layout regardless of the range it
    was sampled from (the procgen determinism contract a curriculum needs)."""
    narrow = ProcMazeEnv(grid=6, num_levels=1, start_level=7)
    wide = narrow.with_levels(num_levels=100, start_level=0)
    assert (wide.num_levels, wide.start_level) == (100, 0)
    assert wide.grid == narrow.grid and wide.density == narrow.density

    s_n, g_n, w_n, t_n = (np.asarray(x) for x in narrow._gen_level(7))
    s_w, g_w, w_w, t_w = (np.asarray(x) for x in wide._gen_level(7))
    np.testing.assert_array_equal(w_n, w_w)
    np.testing.assert_array_equal(s_n, s_w)
    np.testing.assert_array_equal(g_n, g_w)
    np.testing.assert_array_equal(t_n, t_w)


def test_with_levels_preserves_subclass_and_mode():
    """with_levels must reconstruct through type(self) and keep the stored
    distribution_mode, so a subclass env swapped mid-curriculum does not
    silently come back as the base class (ADVICE r2)."""

    class TintedMaze(ProcMazeEnv):
        pass

    env = TintedMaze(grid=6, distribution_mode="hard", num_levels=3)
    swapped = env.with_levels(num_levels=9)
    assert type(swapped) is TintedMaze
    assert swapped.distribution_mode == "hard"
    assert swapped.density == env.density
    assert swapped.num_levels == 9


def test_set_env_carries_training_state_across_the_swap():
    tr = _small_trainer(num_levels=1)
    tr.train(2)
    flat_before = np.asarray(tr.state.flat).copy()
    stats_count = float(np.asarray(tr.state.obs_stats.count).sum())
    archive_len = len(tr.handler.archive)

    tr.set_env(tr.env.with_levels(num_levels=8))
    assert tr.env.num_levels == 8
    tr.train(2)

    assert int(tr.state.epoch) == 4
    assert len(tr.reporter.history) == 4
    # parameters kept evolving from the carried-over state, stats accumulated
    assert not np.array_equal(flat_before, np.asarray(tr.state.flat))
    assert float(np.asarray(tr.state.obs_stats.count).sum()) >= stats_count
    assert len(tr.handler.archive) >= archive_len
    for m in tr.reporter.history:
        assert np.isfinite(m["Noisy Reward"])


def test_set_env_rejects_interface_mismatch():
    tr = _small_trainer()
    with pytest.raises(ValueError, match="obs_shape"):
        tr.set_env(ProcMazeEnv(grid=8, scale=8, max_steps=5))
    with pytest.raises(ValueError, match="obs_shape"):
        tr.set_env(TrapEnv())  # flat 2-obs env

    class SixActionMaze(ProcMazeEnv):
        n_actions = 6

    with pytest.raises(ValueError, match="action"):
        tr.set_env(SixActionMaze(grid=4, scale=4, max_steps=5))


def test_train_level_curriculum_runs_phases():
    tr = _small_trainer(num_levels=1)
    train_level_curriculum(tr, [(1, 1), (2, 4), (1, 16)], fast=True, sync_every=2)
    assert int(tr.state.epoch) == 4
    assert tr.env.num_levels == 16


def test_curriculum_first_phase_swaps_if_needed():
    tr = _small_trainer(num_levels=50)
    train_level_curriculum(tr, [(1, 2)], fast=False)
    assert tr.env.num_levels == 2
    assert int(tr.state.epoch) == 1
