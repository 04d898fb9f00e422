"""Transcode the reference simple_trap_env map.txt into dfd_tpu's npz grid.

Run once (requires the reference mounted): the npz is the framework's shipped
artifact; the text format remains loadable via envs.trap.parse_map_text.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from dfd_tpu.envs.trap import parse_map_text  # noqa: E402

SRC = os.environ.get("DFD_REFERENCE_PATH", "/root/reference") + "/custom_envs/simple_trap_env/map.txt"
DST = os.path.join(os.path.dirname(__file__), "..", "dfd_tpu", "envs", "trap_map.npz")

with open(SRC) as f:
    grid = parse_map_text(f.read())
np.savez_compressed(DST, walkable=grid)
print("wrote", DST, grid.shape, "walkable frac", grid.mean())
