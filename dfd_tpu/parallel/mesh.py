"""Device mesh construction and population sharding helpers.

The scale-out story (SURVEY.md section 5.8): population members are pinned
to devices via a 1-D ``Mesh(("pop",))`` spanning every chip of the slice —
ICI within a host, DCN across hosts.  Parameters are replicated; the only
cross-chip traffic in the steady state is the O(d) reduction of the
fitness-weighted combine, which XLA lowers from the sharded contraction.
Because noise is counter-keyed (core/noise.py), nothing else needs to move:
every device regenerates its shard's perturbations locally — the SPMD
analogue of the reference's encoded-noise wire trick.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_pop_mesh(devices: Optional[Sequence] = None, axis: str = "pop") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def pop_sharding(mesh: Mesh, ndim: int = 1, axis: str = "pop") -> NamedSharding:
    """Shard the leading (population) axis, replicate the rest."""
    return NamedSharding(mesh, PartitionSpec(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join a multi-host pod slice (jax.distributed).

    On single-host runs this is a no-op.  After initialization,
    ``jax.devices()`` spans the full slice and :func:`make_pop_mesh` builds
    the global mesh; the trainer code is unchanged (SPMD).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
