"""Worker process for the multi-host (DCN) test: joins a 2-process
jax.distributed cluster (4 virtual CPU devices each -> 8 global), runs the
shard_map FD combine over the global mesh, and writes its result."""

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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils as mhu  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from dfd_tpu.core.noise import CounterNoise  # noqa: E402
from dfd_tpu.parallel import make_pop_mesh, shard_map_combine  # noqa: E402

D, POP, SIGMA, EPOCH = 96, 16, 0.05, 3
noise = CounterNoise(D, random_seed=0)
mesh = make_pop_mesh()
assert mesh.devices.size == 8, mesh.devices.size

ids_local = np.arange(POP)[pid * (POP // 2) : (pid + 1) * (POP // 2)]
fit_local = np.sin(np.arange(POP, dtype=np.float32))[pid * (POP // 2) : (pid + 1) * (POP // 2)]
ids_g = mhu.host_local_array_to_global_array(ids_local, mesh, P("pop"))
fit_g = mhu.host_local_array_to_global_array(fit_local, mesh, P("pop"))

g = jax.jit(lambda i, f: shard_map_combine(noise, mesh, EPOCH, i, f, SIGMA))(ids_g, fit_g)
result = np.asarray(g.addressable_data(0))
np.save(out_path, result)
print(f"proc {pid} done", flush=True)
