from dfd_tpu.parallel.collectives import shard_map_combine
from dfd_tpu.parallel.mesh import initialize_multihost, make_pop_mesh, pop_sharding, replicated

__all__ = [
    "make_pop_mesh",
    "pop_sharding",
    "replicated",
    "initialize_multihost",
    "shard_map_combine",
]
