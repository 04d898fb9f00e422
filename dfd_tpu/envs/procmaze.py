"""Procgen-shaped procedural pixel env — deterministic levels, varied
layouts, level-dependent visuals, all JAX-native.

The BASELINE config family [3]/[4] targets procgen (reference
utils/init_helper.py:9-12 routes procgen ids to ImpalaPolicy via
ImpalaEnvWrapper); the procgen engine is C++ and cannot be traced.  This env
reproduces procgen's *distributional* semantics as a pure-function `JaxEnv`:

  - a **level** is an integer seed; everything about an episode — wall
    layout, start/goal cells, color palette — is a deterministic function of
    it (procgen levels replay identically);
  - training samples levels uniformly from ``[start_level, start_level +
    num_levels)`` at reset (the procgen ``num_levels``/``start_level``
    contract), so generalization pressure comes from layout variety;
  - ``distribution_mode`` widens the obstacle density like procgen's
    easy/hard split.

Layout generation is connectivity-safe by construction: obstacle cells are
sampled i.i.d. from the level key, then the start cell's row and the goal
cell's column are carved clear, guaranteeing an L-shaped corridor.  Frames
are C x (G*S) x (G*S): channel 0 agent, channel 1 goal, channel 2 walls,
each tinted by a level-keyed palette so visuals vary across levels the way
procgen assets do.  5 actions (stay/up/down/left/right); walls block moves;
reward is the L1 progress delta plus a terminal goal bonus (the same shaped
signal as :class:`PixelGridEnv`, so learning curves are comparable).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dfd_tpu.envs.base import JaxEnv

DENSITY = {"easy": 0.15, "hard": 0.3}


class ProcMazeState(NamedTuple):
    agent: jnp.ndarray   # (2,) int32 row, col
    goal: jnp.ndarray    # (2,) int32
    walls: jnp.ndarray   # (G, G) bool
    tint: jnp.ndarray    # (C,) float32 per-channel intensity
    t: jnp.ndarray       # scalar int32


class ProcMazeEnv(JaxEnv):
    n_actions = 5

    def __init__(
        self,
        grid: int = 8,
        scale: int = 8,
        channels: int = 3,
        max_steps: int = 48,
        num_levels: int = 200,
        start_level: int = 0,
        distribution_mode: str = "easy",
        intensity: float = 255.0,
    ):
        self.grid = grid
        self.scale = scale
        self.channels = channels
        self.max_episode_steps = max_steps
        self.num_levels = int(num_levels)
        self.start_level = int(start_level)
        if distribution_mode not in DENSITY:
            raise ValueError(f"distribution_mode must be one of {sorted(DENSITY)}")
        self.distribution_mode = distribution_mode
        self.density = DENSITY[distribution_mode]
        self.intensity = float(intensity)
        self.obs_shape = (channels, grid * scale, grid * scale)

    def with_levels(self, num_levels=None, start_level=None) -> "ProcMazeEnv":
        """A copy with a different level range — the procgen
        ``num_levels``/``start_level`` contract, used by level curricula
        (utils/curriculum.py).  Level ids are globally deterministic, so a
        level seen under a narrow range replays identically under a wider
        one."""
        return type(self)(
            grid=self.grid,
            scale=self.scale,
            channels=self.channels,
            max_steps=self.max_episode_steps,
            num_levels=self.num_levels if num_levels is None else num_levels,
            start_level=self.start_level if start_level is None else start_level,
            distribution_mode=self.distribution_mode,
            intensity=self.intensity,
        )

    # -- level generation (pure function of the level id) --------------------------

    def _gen_level(self, level):
        """level id -> (start, goal, walls, tint); deterministic replay."""
        key = jax.random.fold_in(jax.random.key(977), level)
        ks, kg, kw, kt = jax.random.split(key, 4)
        g = self.grid
        start = jax.random.randint(ks, (2,), 0, g)
        goal = jax.random.randint(kg, (2,), 0, g)
        walls = jax.random.uniform(kw, (g, g)) < self.density
        rows = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        # carve the start row and the goal column: an L-path always exists
        walls = walls & (rows != start[0]) & (cols != goal[1])
        walls = walls.at[start[0], start[1]].set(False)
        walls = walls.at[goal[0], goal[1]].set(False)
        # level-keyed palette: visual variation across levels (procgen-style)
        tint = self.intensity * jax.random.uniform(
            kt, (self.channels,), minval=0.55, maxval=1.0
        )
        return start, goal, walls, tint

    # -- JaxEnv interface ----------------------------------------------------------

    def reset(self, key) -> Tuple[ProcMazeState, jnp.ndarray]:
        level = self.start_level + jax.random.randint(key, (), 0, self.num_levels)
        start, goal, walls, tint = self._gen_level(level)
        state = ProcMazeState(
            agent=start, goal=goal, walls=walls, tint=tint, t=jnp.asarray(0, jnp.int32)
        )
        return state, self._render(state)

    def step(self, state: ProcMazeState, action):
        a = jnp.asarray(action, jnp.int32)
        dr = jnp.where(a == 1, -1, jnp.where(a == 2, 1, 0))
        dc = jnp.where(a == 3, -1, jnp.where(a == 4, 1, 0))
        cand = jnp.clip(state.agent + jnp.stack([dr, dc]), 0, self.grid - 1)
        blocked = state.walls[cand[0], cand[1]]
        new_agent = jnp.where(blocked, state.agent, cand)

        dist_old = jnp.abs(state.agent - state.goal).sum()
        dist_new = jnp.abs(new_agent - state.goal).sum()
        reached = dist_new == 0
        reward = (dist_old - dist_new).astype(jnp.float32) + 10.0 * reached.astype(jnp.float32)

        t = state.t + 1
        done = reached | (t >= self.max_episode_steps)
        new_state = state._replace(agent=new_agent, t=t)
        return new_state, self._render(new_state), reward, done

    def _render(self, state: ProcMazeState) -> jnp.ndarray:
        g, s = self.grid, self.scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 0) // s
        cols = jax.lax.broadcasted_iota(jnp.int32, (g * s, g * s), 1) // s
        agent_mask = (rows == state.agent[0]) & (cols == state.agent[1])
        goal_mask = (rows == state.goal[0]) & (cols == state.goal[1])
        wall_mask = state.walls[rows, cols]
        planes = [agent_mask, goal_mask, wall_mask][: self.channels]
        while len(planes) < self.channels:
            planes.append(jnp.zeros_like(agent_mask))
        return jnp.stack(
            [state.tint[i] * p.astype(jnp.float32) for i, p in enumerate(planes)]
        )
