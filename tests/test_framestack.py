"""On-device FrameStack / PadChannels env wrappers (deepmind FrameStack
semantics; the reference consumes the host-side equivalent via baselines in
utils/init_helper.py:13-18 and AtariPolicy hardcodes the stacked
in_channels=4, policies/atari.py:10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfd_tpu.envs import FrameStackEnv, PadChannelsEnv, PixelGridEnv


def test_framestack_reset_repeats_first_frame():
    env = FrameStackEnv(PixelGridEnv(grid=4, scale=4, channels=2, intensity=1.0), k=3)
    assert env.obs_shape == (6, 16, 16)
    state, obs = env.reset(jax.random.key(0))
    obs = np.asarray(obs)
    # all k slots hold the first frame at reset (deepmind FrameStack)
    np.testing.assert_array_equal(obs[0:2], obs[2:4])
    np.testing.assert_array_equal(obs[2:4], obs[4:6])


def test_framestack_step_shifts_window():
    inner = PixelGridEnv(grid=4, scale=4, channels=2, intensity=1.0)
    env = FrameStackEnv(inner, k=2)
    state, obs0 = env.reset(jax.random.key(1))
    state, obs1, r1, d1 = env.step(state, 4)  # move right
    state, obs2, r2, d2 = env.step(state, 4)
    obs1, obs2 = np.asarray(obs1), np.asarray(obs2)
    # the newest frame occupies the LAST C channels; after the second step
    # the older slot of obs2 equals the newer slot of obs1
    np.testing.assert_array_equal(obs2[0:2], obs1[2:4])
    # rewards/done flow through from the inner env unchanged
    inner_state, _ = inner.reset(jax.random.key(1))
    s, o, r, d = inner.step(inner_state, 4)
    np.testing.assert_allclose(float(r1), float(r))


def test_framestack_under_vmap_scan():
    """The stack is env state: it must ride vmap + lax.scan untouched."""
    env = FrameStackEnv(PixelGridEnv(grid=4, scale=4, channels=2, intensity=1.0), k=2)

    def rollout(key):
        state, obs = env.reset(key)

        def step(carry, k):
            state, _ = carry
            a = jax.random.randint(k, (), 0, env.n_actions)
            state, obs, r, d = env.step(state, a)
            return (state, obs), r

        (_, last_obs), rews = jax.lax.scan(step, (state, obs), jax.random.split(key, 5))
        return last_obs.sum(), rews.sum()

    sums, rtot = jax.jit(jax.vmap(rollout))(jax.random.split(jax.random.key(0), 4))
    assert sums.shape == (4,) and np.isfinite(np.asarray(rtot)).all()


def test_pad_channels_adds_zero_planes():
    env = PadChannelsEnv(PixelGridEnv(grid=4, scale=4, channels=3, intensity=1.0), to_channels=4)
    assert env.obs_shape == (4, 16, 16)
    state, obs = env.reset(jax.random.key(0))
    state, obs2, r, d = env.step(state, 1)
    for o in (obs, obs2):
        o = np.asarray(o)
        np.testing.assert_array_equal(o[3], np.zeros_like(o[3]))
        assert o[:3].max() > 0


def test_pad_channels_rejects_shrink():
    with pytest.raises(ValueError):
        PadChannelsEnv(PixelGridEnv(grid=4, scale=4, channels=3), to_channels=2)
