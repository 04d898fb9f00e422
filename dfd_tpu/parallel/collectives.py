"""Explicit shard_map formulation of the FD combine.

The jit path lets XLA derive the collective from the sharded einsum; this is
the explicit SPMD spelling — each device combines its local population shard
(regenerating noise from counter ids) and ``psum``s the partial gradient
over the mesh axis.  It exists (a) as documentation of exactly what crosses
ICI, (b) as the building block for overlap experiments (combine-while-
rolling-out), and (c) as the cross-host-correctness test target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.fd.combine import combine_gradient


def shard_map_combine(
    noise: CounterNoise,
    mesh: Mesh,
    epoch,
    member_ids: jnp.ndarray,
    fitness: jnp.ndarray,
    sigma: float,
    axis: str = "pop",
) -> jnp.ndarray:
    """g[d] = psum over mesh axis of each device's local fitness-weighted
    combine; only the O(d) partial gradients cross chips."""

    def local_combine(ids_shard, fitness_shard):
        eps = jax.vmap(lambda i: noise.generate(epoch, i))(ids_shard)
        partial_g = combine_gradient(eps, fitness_shard, sigma)
        return jax.lax.psum(partial_g, axis)

    fn = jax.shard_map(
        local_combine,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    )
    return fn(member_ids, fitness)
