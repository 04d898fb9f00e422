"""JAX-native pixel grid world — the on-device proving ground for the pixel
policy families (Atari CNN, IMPALA ResNet+LSTM).

Procgen/Atari engines are C/C++ and cannot be traced into XLA; they remain
host-side behind the gym adapter.  This env plays their role for the
vectorized trainer: an agent and a goal on a G x G grid, rendered to
C x (G*S) x (G*S) uint8-range frames entirely with jnp ops (channel 0:
agent, channel 1: goal, channel 2: walls/border).  Reaching the goal ends
the episode with +10; each step costs the L1 progress delta, so random
policies already see signal.  5 actions: stay / up / down / left / right.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dfd_tpu.envs.base import JaxEnv


class PixelGridState(NamedTuple):
    agent: jnp.ndarray   # (2,) int32 row, col
    goal: jnp.ndarray    # (2,) int32
    t: jnp.ndarray       # scalar int32


class PixelGridEnv(JaxEnv):
    n_actions = 5

    def __init__(
        self,
        grid: int = 8,
        scale: int = 8,
        channels: int = 3,
        max_steps: int = 40,
        intensity: float = 255.0,
    ):
        """``intensity``: pixel value of active cells.  IMPALA consumes raw
        0-255 frames (it divides by 255 internally, like procgen); the Atari
        CNN expects deepmind-style pre-scaled 0-1 frames — pass 1.0 for it."""
        self.grid = grid
        self.scale = scale
        self.channels = channels
        self.max_episode_steps = max_steps
        self.intensity = float(intensity)
        self.obs_shape = (channels, grid * scale, grid * scale)

    def reset(self, key) -> Tuple[PixelGridState, jnp.ndarray]:
        ka, kg = jax.random.split(key)
        agent = jax.random.randint(ka, (2,), 0, self.grid)
        goal = jax.random.randint(kg, (2,), 0, self.grid)
        state = PixelGridState(agent=agent, goal=goal, t=jnp.asarray(0, jnp.int32))
        return state, self._render(state)

    def step(self, state: PixelGridState, action):
        a = jnp.asarray(action, jnp.int32)
        dr = jnp.where(a == 1, -1, jnp.where(a == 2, 1, 0))
        dc = jnp.where(a == 3, -1, jnp.where(a == 4, 1, 0))
        new_agent = jnp.clip(state.agent + jnp.stack([dr, dc]), 0, self.grid - 1)

        dist_old = jnp.abs(state.agent - state.goal).sum()
        dist_new = jnp.abs(new_agent - state.goal).sum()
        reached = (dist_new == 0)
        reward = (dist_old - dist_new).astype(jnp.float32) + 10.0 * reached.astype(jnp.float32)

        t = state.t + 1
        done = reached | (t >= self.max_episode_steps)
        new_state = PixelGridState(agent=new_agent, goal=state.goal, t=t)
        return new_state, self._render(new_state), reward, done

    def _render(self, state: PixelGridState) -> jnp.ndarray:
        g, s = self.grid, self.scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 0) // s
        cols = jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 1) // s
        agent_mask = (rows == state.agent[0]) & (cols == state.agent[1])
        goal_mask = (rows == state.goal[0]) & (cols == state.goal[1])
        border = (rows == 0) | (rows == g - 1) | (cols == 0) | (cols == g - 1)
        planes = [agent_mask, goal_mask, border][: self.channels]
        while len(planes) < self.channels:
            planes.append(jnp.zeros_like(agent_mask))
        return jnp.stack([self.intensity * p.astype(jnp.float32) for p in planes])
