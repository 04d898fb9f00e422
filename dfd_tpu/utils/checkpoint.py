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
    if trainer._last_archived is not None:
        arrays["last_archived"] = np.asarray(trainer._last_archived)
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
    _restore_archive(trainer.handler, arrays, meta, np.asarray(s.zeta))

    # restore the duplicate-archive guard: without it the next train() call's
    # _archive_current() re-submits the current flat, depositing a distance-0
    # duplicate snapshot into the archive
    la = arrays.get("last_archived")
    trainer._last_archived = np.asarray(la).copy() if la is not None else None


def _restore_archive(handler, arrays, meta, zeta) -> None:
    handler.archive.points = []
    handler.archive.strategy_tensor = []
    handler.archive.known_dists = {}
    handler.archive.worst_point_idx = 0
    handler.archive.zeta = []  # else a warm archive would route submit() into _replace
    handler.zeta = None
    if meta["n_archive"] > 0:
        for flat in arrays["archive.flats"]:
            handler.archive.submit(flat)
    if meta["has_zeta"]:
        handler.set_zeta(zeta)


# ---------------------------------------------------------------------------
# Host-topology (sequential / server runner) checkpoints
# ---------------------------------------------------------------------------


def save_host_checkpoint(path: str, runner) -> None:
    """Persist a SequentialRunner/ServerRunner's training state: learner
    (params, epoch, policy history for drift correction), omega, EMAs, zeta,
    global observation statistics, and the strategy archive."""
    learner = runner.learner
    arrays: Dict[str, np.ndarray] = {
        "flat": np.asarray(learner.flat, np.float32),
        "epoch": np.asarray(learner.epoch),
        "discarded": np.asarray(learner.discarded_returns),
        "zeta": np.asarray(runner.zeta),
        "omega.omega": np.asarray(runner.omega.omega, np.float64),
        "omega.history": np.asarray(runner.omega.reward_history, np.float64),
        "ema.reward": np.asarray(runner.policy_reward if runner.policy_reward is not None else np.nan),
        "ema.entropy": np.asarray(runner.policy_entropy if runner.policy_entropy is not None else np.nan),
        "ema.novelty": np.asarray(runner.policy_novelty if runner.policy_novelty is not None else np.nan),
        "history.flats": np.stack([f for f, _ in learner.policy_history]),
        "history.epochs": np.asarray([e for _, e in learner.policy_history]),
    }
    if hasattr(runner, "global_obs_stats"):
        arrays["obs.serialized"] = np.asarray(runner.global_obs_stats.serialize(), np.float64)
    archive_flats = [p.flat for p in runner.strategy_handler.archive.points]
    if archive_flats:
        arrays["archive.flats"] = np.stack(archive_flats)

    # host RNG streams (exact resume for the sequential topology)
    pcg = {}
    for name, rs in _host_rngs(runner).items():
        if isinstance(rs, np.random.RandomState):
            kind, keys, pos, has_gauss, cached = rs.get_state()
            arrays[f"rng.{name}.keys"] = np.asarray(keys)
            arrays[f"rng.{name}.rest"] = np.asarray([pos, has_gauss, cached], np.float64)
        elif hasattr(rs, "bit_generator"):
            st = rs.bit_generator.state
            pcg[name] = {
                "state": str(st["state"]["state"]),
                "inc": str(st["state"]["inc"]),
                "has_uint32": int(st["has_uint32"]),
                "uinteger": int(st["uinteger"]),
            }

    # episode continuity (agent position + env mid-state), sequential topology
    agent = getattr(runner, "agent", None)
    if agent is not None:
        arrays["agent.last_obs"] = np.asarray(agent.last_obs)
        arrays["agent.cumulative"] = np.asarray(agent.cumulative_timesteps)
        env_state = getattr(agent.env, "_state", None)
        if env_state is not None:
            import jax

            leaves = jax.tree.leaves(env_state)
            for i, leaf in enumerate(leaves):
                arrays[f"env.leaf{i}"] = np.asarray(leaf)

    meta = {
        "n_archive": len(archive_flats),
        "has_zeta": runner.strategy_handler.zeta is not None,
        "has_obs": hasattr(runner, "global_obs_stats"),
        "pcg": pcg,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)


def _host_rngs(runner) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for name, obj in (
        ("runner", getattr(runner, "rng", None)),
        ("buffer", getattr(runner, "_buffer_rng", None)),
        ("worker", getattr(getattr(runner, "worker", None), "rng", None)),
        ("agent", getattr(getattr(runner, "agent", None), "rng", None)),
        ("sampler", getattr(getattr(getattr(runner, "policy", None), "sampler", None), "rng", None)),
        ("noise", getattr(getattr(runner, "learner", None), "noise_source", None)
         and getattr(runner.learner.noise_source, "rng", None)),
    ):
        if obj is not None:
            out[name] = obj
    return out


def load_host_checkpoint(path: str, runner) -> None:
    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(str(arrays.pop("__meta__")))

    learner = runner.learner
    learner.flat = np.asarray(arrays["flat"], np.float32)
    learner.epoch = int(arrays["epoch"])
    learner.discarded_returns = int(arrays["discarded"])
    learner.policy_history = [
        (np.asarray(f, np.float32), int(e))
        for f, e in zip(arrays["history.flats"], arrays["history.epochs"])
    ]
    learner._build_distance_map()
    runner.policy.set_trainable_flat(learner.flat)

    runner.omega.omega = float(arrays["omega.omega"])
    runner.omega.reward_history = [float(v) for v in arrays["omega.history"]]
    nan_to_none = lambda v: None if np.isnan(v) else float(v)
    runner.policy_reward = nan_to_none(arrays["ema.reward"])
    runner.policy_entropy = nan_to_none(arrays["ema.entropy"])
    runner.policy_novelty = nan_to_none(arrays["ema.novelty"])
    runner.zeta[:] = arrays["zeta"]
    if meta["has_obs"] and "obs.serialized" in arrays:
        runner.global_obs_stats.deserialize(list(arrays["obs.serialized"]))

    for name, rs in _host_rngs(runner).items():
        if isinstance(rs, np.random.RandomState) and f"rng.{name}.keys" in arrays:
            pos, has_gauss, cached = arrays[f"rng.{name}.rest"]
            rs.set_state(
                ("MT19937", arrays[f"rng.{name}.keys"].astype(np.uint32), int(pos),
                 int(has_gauss), float(cached))
            )
        elif hasattr(rs, "bit_generator") and name in meta["pcg"]:
            saved = meta["pcg"][name]
            st = rs.bit_generator.state
            st["state"] = {"state": int(saved["state"]), "inc": int(saved["inc"])}
            st["has_uint32"] = int(saved["has_uint32"])
            st["uinteger"] = int(saved["uinteger"])
            rs.bit_generator.state = st

    # refresh the broadcast state so workers tag returns with the restored
    # epoch (otherwise the drift correction treats them as stale)
    state = getattr(runner, "current_state", None)
    if state is not None:
        state.epoch = learner.epoch
        state.policy_params = runner.policy.serialize()
    worker = getattr(runner, "worker", None)
    if worker is not None and hasattr(worker, "epoch"):
        worker.epoch = learner.epoch

    agent = getattr(runner, "agent", None)
    if agent is not None and "agent.last_obs" in arrays:
        agent.last_obs = arrays["agent.last_obs"]
        agent.cumulative_timesteps = int(arrays["agent.cumulative"])
        env_state = getattr(agent.env, "_state", None)
        if env_state is not None and "env.leaf0" in arrays:
            import jax

            treedef = jax.tree.structure(env_state)
            n_leaves = treedef.num_leaves
            leaves = [arrays[f"env.leaf{i}"] for i in range(n_leaves)]
            agent.env._state = jax.tree.unflatten(treedef, leaves)

    _restore_archive(runner.strategy_handler, arrays, meta, np.asarray(runner.zeta))
