"""Environment interface for the vectorized TPU-native rollout engine.

A :class:`JaxEnv` is a *pure-function* environment: ``reset`` and ``step``
are side-effect-free maps over an explicit state pytree, so whole populations
of episodes run in lockstep under ``vmap`` + ``lax.scan`` on device.  This is
the TPU-first inversion of the reference's one-object-one-episode gym loop
(reference worker/agent.py:35-52): instead of ~batch x episode_len python
round-trips of batch-1 forwards, the entire population x time grid is one
XLA program.

Environments whose engines cannot be traced (MuJoCo, Atari, procgen) plug in
via the host adapter pool in :mod:`dfd_tpu.envs.host_pool` instead.
"""

from __future__ import annotations

import abc
from typing import Any, Tuple

import jax.numpy as jnp

EnvState = Any  # a pytree of jnp arrays


class JaxEnv(abc.ABC):
    """Stateless environment definition (state travels explicitly)."""

    #: shape of one observation
    obs_shape: Tuple[int, ...]
    #: number of discrete actions, or None for continuous
    n_actions: int | None = None
    #: dimension of a continuous action, or None for discrete
    action_dim: int | None = None
    #: natural episode length cap for this env (used as the scan length)
    max_episode_steps: int = 1000

    @property
    def discrete(self) -> bool:
        return self.n_actions is not None

    @property
    def obs_dim(self) -> int:
        d = 1
        for s in self.obs_shape:
            d *= s
        return d

    @abc.abstractmethod
    def reset(self, key) -> Tuple[EnvState, jnp.ndarray]:
        """Start an episode; returns (state, first observation)."""

    @abc.abstractmethod
    def step(self, state: EnvState, action) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Advance one step; returns (state, obs, reward, done)."""
