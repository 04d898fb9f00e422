"""JAX-native Pendulum (gymnasium Pendulum-v1 dynamics): the continuous
control proving ground for the Gaussian MLP policy on device."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dfd_tpu.envs.base import JaxEnv

MAX_SPEED = 8.0
MAX_TORQUE = 2.0
DT = 0.05
G = 10.0
M = 1.0
L = 1.0


class PendulumState(NamedTuple):
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray


def _angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class PendulumEnv(JaxEnv):
    n_actions = None
    action_dim = 1
    obs_shape = (3,)
    max_episode_steps = 200

    def reset(self, key) -> Tuple[PendulumState, jnp.ndarray]:
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, minval=-1.0, maxval=1.0)
        state = PendulumState(theta, theta_dot, jnp.asarray(0, jnp.int32))
        return state, self._obs(state)

    def step(self, state: PendulumState, action):
        # policy actions live in [-1, 1] (tanh head); scale to the torque range
        u = jnp.clip(jnp.reshape(jnp.asarray(action), ()) * MAX_TORQUE, -MAX_TORQUE, MAX_TORQUE)
        th = _angle_normalize(state.theta)
        cost = th ** 2 + 0.1 * state.theta_dot ** 2 + 0.001 * u ** 2

        new_dot = state.theta_dot + (3 * G / (2 * L) * jnp.sin(state.theta) + 3.0 / (M * L ** 2) * u) * DT
        new_dot = jnp.clip(new_dot, -MAX_SPEED, MAX_SPEED)
        new_theta = state.theta + new_dot * DT

        new = PendulumState(new_theta, new_dot, state.t + 1)
        done = new.t >= self.max_episode_steps
        return new, self._obs(new), -cost.astype(jnp.float32), done

    def _obs(self, s: PendulumState) -> jnp.ndarray:
        return jnp.stack([jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot]).astype(jnp.float32)
