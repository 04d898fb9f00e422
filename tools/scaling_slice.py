"""Multi-host weak-scaling measurement for a REAL TPU pod slice — the
ready-to-run harness for BASELINE.md's ">= 85 % scaling efficiency from 1
host to N hosts" north star (unmeasurable in this image, which exposes one
chip; the same trainer/mesh code is proven multi-process-correct by
tests/test_multihost.py's 2-process jax.distributed run).

Usage (one invocation per host of the slice, standard jax.distributed env):

    # 1-host baseline (run on a single host of the slice):
    python tools/scaling_slice.py --num-processes 1 --batch-per-host 2048

    # N-host run (on every host i of the slice):
    python tools/scaling_slice.py \
        --coordinator <host0-ip>:8476 --num-processes N --process-id i \
        --batch-per-host 2048

Weak scaling: the population grows with the slice (P = batch_per_host x N,
sharded over the global ``Mesh(("pop",))``), parameters stay replicated, and
the only cross-host traffic is the O(d) psum of the fitness-weighted combine
(counter noise regenerates locally — SURVEY.md section 5.8).  Efficiency =
steps_per_s(N) / (N x steps_per_s(1)); the north star is >= 0.85.

Each host prints one JSON line; aggregate steps/s is identical on every host
(the metric sums global timesteps).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --cpu-devices N (debug/smoke): virtual CPU devices instead of the slice;
# the XLA flag must land before jax import
if "--cpu-devices" in sys.argv:
    _n = sys.argv[sys.argv.index("--cpu-devices") + 1]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={_n}"
    )

import jax

if "--cpu-devices" in sys.argv:
    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None, help="host0 ip:port")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--batch-per-host", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--env", default="SimpleTrapEnv-v0")
    ap.add_argument("--cpu-devices", type=int, default=None,
                    help="debug: run on N virtual cpu devices instead of the slice")
    args = ap.parse_args()

    from dfd_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    from dfd_tpu.config import TrainConfig
    from dfd_tpu.parallel import make_pop_mesh
    from dfd_tpu.runners.vectorized import VectorizedTrainer
    from dfd_tpu.utils.factory import get_vectorized_init_data
    from dfd_tpu.utils.metrics import EpochReporter

    env, model, distance_fn = get_vectorized_init_data(args.env)
    P = args.batch_per_host * args.num_processes
    cfg = TrainConfig(
        batch_size=P,
        learning_rate=0.05,
        noise_std=0.05,
        zeta_size=64,
        max_strategy_history_size=16,
        random_seed=0,
        scan_unroll=8,
    )
    mesh = make_pop_mesh()  # spans the whole slice after initialize_multihost
    tr = VectorizedTrainer(
        model, env, distance_fn, cfg, mesh=mesh, reporter=EpochReporter(quiet=True)
    )

    archive, count = tr._archive_inputs()
    state = tr.state
    for _ in range(args.warmup):
        state, _ = tr._step(state, archive, count)
    jax.block_until_ready(state.flat)

    timesteps = []
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        state, metrics = tr._step(state, archive, count)
        timesteps.append(metrics["_timesteps"])
    jax.block_until_ready(state.flat)
    dt = time.perf_counter() - t0

    steps_total = int(sum(int(t) for t in timesteps))
    print(
        json.dumps(
            {
                "metric": "fd_eval_env_steps_per_s_aggregate",
                "value": round(steps_total / dt, 1),
                "unit": "env-steps/s",
                "num_processes": args.num_processes,
                "devices": jax.device_count(),
                "batch_size": P,
                "epochs": args.epochs,
                "seconds": round(dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
