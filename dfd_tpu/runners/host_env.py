"""Gym-style host adapter over a functional JaxEnv.

The sequential (parity) runner and the elastic CPU clients step episodes one
at a time on the host; this adapter jits a JaxEnv's reset/step once and keeps
the state pytree internally, exposing the reference's ``reset() -> obs`` /
``step(a) -> (obs, reward, done, info)`` surface.
"""

from __future__ import annotations

import jax
import numpy as np

from dfd_tpu.envs.base import JaxEnv


class HostEnv:
    def __init__(self, env: JaxEnv, seed: int = 0):
        self.env = env
        self._key = jax.random.key(seed)
        self._reset_fn = jax.jit(lambda key: env.reset(key))
        self._step_fn = jax.jit(lambda s, a: env.step(s, a))
        self._state = None

    @property
    def n_actions(self):
        return self.env.n_actions

    @property
    def obs_shape(self):
        return self.env.obs_shape

    def seed(self, seed: int) -> None:
        self._key = jax.random.key(seed)

    def reset(self) -> np.ndarray:
        self._key, sub = jax.random.split(self._key)
        self._state, obs = self._reset_fn(sub)
        return np.asarray(obs)

    def step(self, action):
        self._state, obs, reward, done = self._step_fn(self._state, action)
        return np.asarray(obs), float(reward), bool(done), {}
