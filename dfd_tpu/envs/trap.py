"""JAX-native ``simple_trap_env`` — the exact-parity target environment.

The reference implements this deterministic grid world as a graph of Node
objects built from ``map.txt`` and steps it one python object-hop at a time
(reference custom_envs/simple_trap_env/environment.py:8-84, tile_map.py:4-60,
node.py:1-17).  Here the same dynamics are a pure gather over a precomputed
walkability grid, so thousands of instances step in lockstep on device:

- The map is a H x W boolean grid (walkable when the map token is exactly
  "0"; the reference's line parsing leaves a trailing ``"0\\n"`` token per row
  which is *not* equal to "0", making the rightmost column unwalkable except
  on the file's final line — reproduced exactly by the transcoded grid).
- 9 actions index a 3x3 neighborhood, ordered x-major:
  ``dx = a // 3 - 1, dy = a % 3 - 1`` (the link construction order in
  tile_map.py:11-23).  Out-of-bounds or unwalkable targets leave the agent in
  place.
- Grid coordinates map to world units via ``node_radius = 7``; the
  observation is ``(x/1918, y/1071)`` and the reward is the per-step progress
  along +x in world units (environment.py:40-42, 59-61).
- ``done`` is evaluated against the step counter *before* it increments, so
  an episode spans ``episode_length + 1 = 201`` steps (environment.py:43-45).

The grid ships transcoded as ``trap_map.npz`` (generated once from the
reference's map.txt by ``tools/transcode_trap_map.py``); a text loader with
the reference's exact parsing rules is kept for loading other maps.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from dfd_tpu.envs.base import JaxEnv

NODE_RADIUS = 7
MAX_X = 1918
MAX_Y = 1071
EPISODE_LENGTH = 200

_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "trap_map.npz")


def parse_map_text(text: str) -> np.ndarray:
    """Parse a map in the reference's text format into a walkability grid.

    Mirrors the reference parser's behavior exactly: rows are split on single
    spaces and a tile is walkable iff its token is exactly "0" (so trailing
    newline tokens make unwalkable cells).
    """
    rows = []
    for line in text.splitlines(keepends=True):
        rows.append([tok == "0" for tok in line.split(" ")])
    width = max(len(r) for r in rows)
    grid = np.zeros((len(rows), width), dtype=bool)
    for i, r in enumerate(rows):
        grid[i, : len(r)] = r
    return grid


def load_walkable_grid(path: str | None = None) -> np.ndarray:
    """Load the walkability grid from npz (default) or a reference-format txt."""
    if path is None:
        return np.load(_DATA)["walkable"]
    if path.endswith(".npz"):
        return np.load(path)["walkable"]
    with open(path) as f:
        return parse_map_text(f.read())


class TrapState(NamedTuple):
    ix: jnp.ndarray  # column index, int32
    iy: jnp.ndarray  # row index, int32
    t: jnp.ndarray   # step counter, int32


class TrapEnv(JaxEnv):
    """Deterministic grid world; exact behavioral parity with the reference."""

    n_actions = 9
    obs_shape = (2,)
    max_episode_steps = EPISODE_LENGTH + 1  # done fires on the 201st step

    def __init__(self, map_path: str | None = None):
        grid = load_walkable_grid(map_path)
        self._walkable = jnp.asarray(grid)
        self.height, self.width = grid.shape
        # reference start: get_node(width*7//2, height*7//2) -> floor division
        # through world units and back (environment.py:22)
        self.start_ix = (self.width * NODE_RADIUS // 2) // NODE_RADIUS
        self.start_iy = (self.height * NODE_RADIUS // 2) // NODE_RADIUS

    def reset(self, key=None) -> Tuple[TrapState, jnp.ndarray]:
        state = TrapState(
            ix=jnp.asarray(self.start_ix, jnp.int32),
            iy=jnp.asarray(self.start_iy, jnp.int32),
            t=jnp.asarray(0, jnp.int32),
        )
        return state, self._obs(state)

    def step(self, state: TrapState, action):
        a = jnp.asarray(action, jnp.int32)
        # out-of-range actions are no-ops (node.py:9-11 guard)
        valid = (a >= 0) & (a < 9)
        a = jnp.clip(a, 0, 8)
        dx = jnp.where(valid, a // 3 - 1, 0)
        dy = jnp.where(valid, a % 3 - 1, 0)
        tx = state.ix + dx
        ty = state.iy + dy
        in_bounds = (tx >= 0) & (tx < self.width) & (ty >= 0) & (ty < self.height)
        # out-of-bounds links point back to the node itself (tile_map.py:20-22)
        tx = jnp.where(in_bounds, tx, state.ix)
        ty = jnp.where(in_bounds, ty, state.iy)
        ok = self._walkable[ty, tx]
        nx = jnp.where(ok, tx, state.ix)
        ny = jnp.where(ok, ty, state.iy)
        reward = (NODE_RADIUS * (nx - state.ix)).astype(jnp.float32)
        done = state.t >= EPISODE_LENGTH
        new_state = TrapState(ix=nx, iy=ny, t=state.t + 1)
        return new_state, self._obs(new_state), reward, done

    def _obs(self, state: TrapState) -> jnp.ndarray:
        return jnp.stack(
            [
                (state.ix * NODE_RADIUS) / MAX_X,
                (state.iy * NODE_RADIUS) / MAX_Y,
            ]
        ).astype(jnp.float32)
