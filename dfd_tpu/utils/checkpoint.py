"""Checkpoint / resume.

The reference loses the entire run on a crash (no training-state persistence
anywhere; SURVEY.md section 5.4).  Here every piece of training state
round-trips through a single npz file: trainable flat, BatchNorm state,
omega schedule state, observation statistics, zeta, EMA baselines, epoch,
PRNG key, cumulative timesteps, and the strategy archive (as its snapshot
flats — distances and eviction bookkeeping are recomputed deterministically
from them on restore).  This is also the substrate for preemption-tolerant
multi-host runs: every host restores the same replicated state.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten_tree(tree, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten_tree(v, f"{prefix}.{k}", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten_tree(flat: Dict[str, np.ndarray], prefix: str):
    tree: Dict[str, Any] = {}
    plen = len(prefix) + 1
    for key, value in flat.items():
        if not key.startswith(prefix + "."):
            continue
        parts = key[plen:].split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_checkpoint(path: str, trainer) -> None:
    """Persist a VectorizedTrainer's full training state."""
    s = trainer.state
    arrays: Dict[str, np.ndarray] = {
        "flat": np.asarray(s.flat),
        "zeta": np.asarray(s.zeta),
        "omega.omega": np.asarray(s.omega.omega),
        "omega.history": np.asarray(s.omega.history),
        "omega.filled": np.asarray(s.omega.filled),
        "omega.cursor": np.asarray(s.omega.cursor),
        "obs.mean": np.asarray(s.obs_stats.mean),
        "obs.m2": np.asarray(s.obs_stats.m2),
        "obs.count": np.asarray(s.obs_stats.count),
        "ema.reward": np.asarray(s.policy_reward),
        "ema.entropy": np.asarray(s.policy_entropy),
        "ema.novelty": np.asarray(s.policy_novelty),
        "epoch": np.asarray(s.epoch),
        "key": np.asarray(jax.random.key_data(s.key)),
        "cumulative_timesteps": np.asarray(trainer.cumulative_timesteps),
    }
    _flatten_tree(jax.tree.map(np.asarray, s.bn_state), "bn", arrays)
    archive_flats = [p.flat for p in trainer.handler.archive.points]
    if archive_flats:
        arrays["archive.flats"] = np.stack(archive_flats)
    meta = {"n_archive": len(archive_flats), "has_zeta": trainer.handler.zeta is not None}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)  # atomic publish


def load_checkpoint(path: str, trainer) -> None:
    """Restore a VectorizedTrainer's state in place (same config/model)."""
    import jax.numpy as jnp

    from dfd_tpu.core.welford import WelfordState
    from dfd_tpu.fd.omega import OmegaState

    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(str(arrays.pop("__meta__")))

    bn_state = jax.tree.map(jnp.asarray, _unflatten_tree(arrays, "bn"))
    s = trainer.state._replace(
        flat=jnp.asarray(arrays["flat"]),
        bn_state=bn_state if bn_state else trainer.state.bn_state,
        omega=OmegaState(
            omega=jnp.asarray(arrays["omega.omega"]),
            history=jnp.asarray(arrays["omega.history"]),
            filled=jnp.asarray(arrays["omega.filled"]),
            cursor=jnp.asarray(arrays["omega.cursor"]),
        ),
        obs_stats=WelfordState(
            mean=jnp.asarray(arrays["obs.mean"]),
            m2=jnp.asarray(arrays["obs.m2"]),
            count=jnp.asarray(arrays["obs.count"]),
        ),
        zeta=jnp.asarray(arrays["zeta"]),
        policy_reward=jnp.asarray(arrays["ema.reward"]),
        policy_entropy=jnp.asarray(arrays["ema.entropy"]),
        policy_novelty=jnp.asarray(arrays["ema.novelty"]),
        epoch=jnp.asarray(arrays["epoch"]),
        key=jax.random.wrap_key_data(jnp.asarray(arrays["key"])),
    )
    trainer.state = s
    trainer.cumulative_timesteps = int(arrays["cumulative_timesteps"])

    # rebuild the strategy archive from snapshot flats
    handler = trainer.handler
    handler.archive.points = []
    handler.archive.strategy_tensor = []
    handler.archive.known_dists = {}
    handler.archive.worst_point_idx = 0
    handler.zeta = None
    if meta["n_archive"] > 0:
        for flat in arrays["archive.flats"]:
            handler.archive.submit(flat)
    if meta["has_zeta"]:
        handler.set_zeta(np.asarray(s.zeta))
