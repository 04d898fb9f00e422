"""Typed training configuration.

One dataclass seeds every topology (sequential, vectorized single-chip,
mesh-sharded multi-host, elastic server/client) and is recorded in
checkpoints — replacing the reference's three ad-hoc config surfaces
(constructor kwargs, protobuf-Struct wire config, wandb sweep dicts;
reference run_server.py:20-47, networking/server.py:106-112).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class OmegaConfig:
    default_value: float = 0.0
    improvement_threshold: float = 1.035
    reward_history_size: int = 20
    min_value: float = 0.0
    max_value: float = 1.0
    steps_to_min: int = 25
    steps_to_max: int = 75


@dataclasses.dataclass
class TrainConfig:
    env_id: str = "SimpleTrapEnv-v0"
    learning_rate: float = 0.01
    noise_std: float = 0.02
    batch_size: int = 40                 # perturbations per update (population)
    envs_per_perturbation: int = 1       # episodes averaged per member
    # E>1 lowering for the unchunked path: "flat" collapses (member, episode)
    # into one (P*E)-wide population vmap (batches env dynamics better —
    # 1.8x on the swimmer's physics); "nested" keeps vmap(P)∘vmap(E)
    # (memory-lean, and gives each member's forward an M=E GEMM dimension —
    # 3.6x on the tiny trap MLP).  The ranking is workload-dependent, so
    # "auto" compiles both at trainer init and keeps the measured winner
    # (bit-identical results either way; deterministic fallbacks under
    # multi-process SPMD or >1 GiB of replicated parameters).
    e_lowering: str = "auto"
    # mirrored perturbation pairs theta +- sigma*eps (members 2k/2k+1 share
    # eps_k with opposite signs) — variance-reduced vs the reference's
    # one-sided theta + sigma*eps (reference worker/worker.py:26-30);
    # requires an even batch_size
    antithetic: bool = False
    ent_coef: float = 0.0
    random_seed: int = 123
    max_delayed_return: int = 10
    vbn_buffer_size: int = 0
    zeta_size: int = 200
    max_strategy_history_size: int = 200
    eval_prob: float = 0.05              # sequential/elastic topologies
    eval_every: int = 1                  # vectorized topology: eval cadence (epochs)
    normalize_obs: bool = False
    obs_stats_update_chance: float = 0.01
    episode_length: Optional[int] = None  # scan horizon; None -> env default
    timestep_limit: int = 50_000_000
    omega: OmegaConfig = dataclasses.field(default_factory=OmegaConfig)
    # optimizer
    optimizer: str = "dsgd"              # "dsgd" | "sgd"
    dsgd_min_scale: float = 0.23
    dsgd_max_scale: float = 1.0
    # parallel layout
    mesh_axes: Tuple[str, ...] = ("pop",)
    population_chunk: Optional[int] = None  # microbatch population to bound memory
    # noise backend: "jax" (counter keys + jax.random.normal) or "pallas"
    # (in-kernel counter-hash regeneration; zero noise HBM traffic)
    noise_backend: str = "jax"
    # lax.scan unroll factor for the rollout time axis (throughput vs compile time)
    scan_unroll: int = 1

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
