"""JAX-native CartPole (classic-control dynamics, gymnasium CartPole-v1
semantics): fully on-device, vmappable, the config[1]-class proving ground
for vectorized discrete-policy training."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dfd_tpu.envs.base import JaxEnv

GRAVITY = 9.8
MASSCART = 1.0
MASSPOLE = 0.1
TOTAL_MASS = MASSCART + MASSPOLE
LENGTH = 0.5  # half pole length
POLEMASS_LENGTH = MASSPOLE * LENGTH
FORCE_MAG = 10.0
TAU = 0.02
THETA_LIMIT = 12 * 2 * jnp.pi / 360
X_LIMIT = 2.4


class CartPoleState(NamedTuple):
    x: jnp.ndarray
    x_dot: jnp.ndarray
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray


class CartPoleEnv(JaxEnv):
    n_actions = 2
    obs_shape = (4,)
    max_episode_steps = 500

    def reset(self, key) -> Tuple[CartPoleState, jnp.ndarray]:
        vals = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        state = CartPoleState(vals[0], vals[1], vals[2], vals[3], jnp.asarray(0, jnp.int32))
        return state, self._obs(state)

    def step(self, state: CartPoleState, action):
        force = jnp.where(jnp.asarray(action) == 1, FORCE_MAG, -FORCE_MAG)
        cos_t = jnp.cos(state.theta)
        sin_t = jnp.sin(state.theta)
        temp = (force + POLEMASS_LENGTH * state.theta_dot ** 2 * sin_t) / TOTAL_MASS
        theta_acc = (GRAVITY * sin_t - cos_t * temp) / (
            LENGTH * (4.0 / 3.0 - MASSPOLE * cos_t ** 2 / TOTAL_MASS)
        )
        x_acc = temp - POLEMASS_LENGTH * theta_acc * cos_t / TOTAL_MASS

        new = CartPoleState(
            x=state.x + TAU * state.x_dot,
            x_dot=state.x_dot + TAU * x_acc,
            theta=state.theta + TAU * state.theta_dot,
            theta_dot=state.theta_dot + TAU * theta_acc,
            t=state.t + 1,
        )
        done = (
            (jnp.abs(new.x) > X_LIMIT)
            | (jnp.abs(new.theta) > THETA_LIMIT)
            | (new.t >= self.max_episode_steps)
        )
        return new, self._obs(new), jnp.float32(1.0), done

    def _obs(self, s: CartPoleState) -> jnp.ndarray:
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot]).astype(jnp.float32)
