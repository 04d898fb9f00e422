"""On-device frame stacking for pixel JaxEnvs.

The deepmind Atari pipeline's ``FrameStack(k)`` (the reference consumes it
via baselines' ``wrap_deepmind`` in utils/init_helper.py:13-18, and the
reference AtariPolicy hardcodes the stacked ``in_channels = 4``,
policies/atari.py:10) concatenates the last k frames along the channel axis
and fills all k slots with the first frame at reset.  This is the JAX-native
equivalent: the stack is part of the environment state pytree, so it rides
``vmap``/``lax.scan`` with the rest of the rollout — no host-side deque.

(The host-side analogue for real ALE envs lives in
``dfd_tpu.envs.atari_wrappers.FrameStack``.)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from dfd_tpu.envs.base import EnvState, JaxEnv


class FrameStackEnv(JaxEnv):
    """Stack the last ``k`` CHW observations of ``env`` along channels."""

    def __init__(self, env: JaxEnv, k: int = 4):
        if len(env.obs_shape) != 3:
            raise ValueError(f"FrameStackEnv needs CHW frames, got obs_shape={env.obs_shape}")
        self.env = env
        self.k = int(k)
        c, h, w = env.obs_shape
        self.frame_channels = c
        self.obs_shape = (self.k * c, h, w)
        self.n_actions = env.n_actions
        self.action_dim = env.action_dim
        self.max_episode_steps = env.max_episode_steps

    def reset(self, key) -> Tuple[EnvState, jnp.ndarray]:
        state, obs = self.env.reset(key)
        stack = jnp.tile(obs, (self.k, 1, 1))  # first frame fills all k slots
        return (state, stack), stack

    def step(self, state: EnvState, action):
        inner, stack = state
        new_inner, obs, reward, done = self.env.step(inner, action)
        new_stack = jnp.concatenate([stack[self.frame_channels:], obs], axis=0)
        return (new_inner, new_stack), new_stack, reward, done


class PadChannelsEnv(JaxEnv):
    """Zero-pad a pixel env's channel axis up to ``to_channels``.

    Adapts C<4-channel envs to policies with a hardcoded stacked-channel
    input (the reference AtariPolicy's ``in_channels = 4``,
    policies/atari.py:10): the extra planes are constant zero, i.e. unused
    stacked-frame slots."""

    def __init__(self, env: JaxEnv, to_channels: int = 4):
        c, h, w = env.obs_shape
        if to_channels < c:
            raise ValueError(f"to_channels={to_channels} < env channels {c}")
        self.env = env
        self.pad = to_channels - c
        self.obs_shape = (to_channels, h, w)
        self.n_actions = env.n_actions
        self.action_dim = env.action_dim
        self.max_episode_steps = env.max_episode_steps

    def _padded(self, obs):
        z = jnp.zeros((self.pad,) + obs.shape[1:], obs.dtype)
        return jnp.concatenate([obs, z], axis=0)

    def reset(self, key):
        state, obs = self.env.reset(key)
        return state, self._padded(obs)

    def step(self, state, action):
        new_state, obs, reward, done = self.env.step(state, action)
        return new_state, self._padded(obs), reward, done
