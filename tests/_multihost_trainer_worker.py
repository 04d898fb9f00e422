"""Worker process for the whole-trainer multi-process test: joins a
2-process jax.distributed cluster (4 virtual CPU devices each -> 8 global),
runs FULL VectorizedTrainer epochs with the population sharded over the
global mesh, and writes the final parameters + metric trajectory.

Every process executes identical host code with identical seeds, so the
host-side pieces (strategy archive, metrics) stay in lockstep and the jitted
epoch's inputs are replicated — the pod-slice SPMD deployment shape
(SURVEY.md section 5.8) without a pod.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

from dfd_tpu.parallel.mesh import initialize_multihost  # noqa: E402

initialize_multihost(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402

from dfd_tpu.config import TrainConfig  # noqa: E402
from dfd_tpu.envs.trap import TrapEnv  # noqa: E402
from dfd_tpu.models import DiscreteMLP  # noqa: E402
from dfd_tpu.ops import distances  # noqa: E402
from dfd_tpu.parallel import make_pop_mesh  # noqa: E402
from dfd_tpu.runners.vectorized import VectorizedTrainer  # noqa: E402
from dfd_tpu.utils.metrics import EpochReporter  # noqa: E402

mesh = make_pop_mesh()
assert mesh.devices.size == 8, mesh.devices.size

cfg = TrainConfig(
    batch_size=8,
    learning_rate=0.05,
    noise_std=0.05,
    zeta_size=8,
    max_strategy_history_size=4,
    random_seed=7,
    normalize_obs=True,
    obs_stats_update_chance=0.1,
)
tr = VectorizedTrainer(
    DiscreteMLP(2, 9), TrapEnv(), distances.categorical_tvd, cfg,
    mesh=mesh, reporter=EpochReporter(quiet=True),
)
tr.train(3)

flat = np.asarray(tr.state.flat)
noisy = np.asarray([r["Noisy Reward"] for r in tr.reporter.history], np.float64)
policy = np.asarray([r["Policy Reward"] for r in tr.reporter.history], np.float64)
np.savez(out_path, flat=flat, noisy=noisy, policy=policy,
         timesteps=np.int64(tr.cumulative_timesteps))
print(f"proc {pid} done", flush=True)
