"""Fitness-weighted gradient combine — the on-device replacement for the
reference's SubmitReturns + learner dot product (reference
finite_differences.py:40-49, networking/server.py:75-95).

Given per-member fitness f_i and the perturbation noise eps_i (regenerable
from counter ids, never shipped), the estimator is

    g = sum_i f_i * (sigma eps_i) / || sigma eps_i ||^2

The sum (not mean) matches the reference's discarded ``/len(batch)`` —
see fd/learner.py.  When the population is sharded over a mesh axis the
einsum contracts the sharded axis, which XLA lowers to a reduce-scatter /
all-reduce over ICI; nothing else crosses chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dfd_tpu.core.noise import CounterNoise
from dfd_tpu.ops.standardize import standardize


def fitness_from_rewards(rewards: jnp.ndarray, baseline, tie_key) -> jnp.ndarray:
    """Baseline-subtract + standardize, with the reference's tie-break.

    The reference jiggles each float64 reward by +-1e-12 so an all-equal
    batch standardizes to random signs instead of hitting the std==0
    passthrough (reference worker/agent.py:68-69).  In float32 that jiggle
    underflows, so the equivalent semantic is applied directly: if the batch
    is exactly constant, the fitness IS random +-1 signs.
    """
    shifted = rewards - baseline
    std = shifted.std()
    signs = jax.random.rademacher(tie_key, rewards.shape, jnp.float32)
    return jnp.where(std == 0, signs, standardize(shifted, xp=jnp))


def combine_gradient(eps: jnp.ndarray, fitness: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """g[d] = sum_i fitness_i * (sigma eps_i) / ||sigma eps_i||^2  from
    materialized noise eps [P, d]."""
    sq = jnp.sum(eps * eps, axis=-1) * (sigma * sigma)
    w = fitness * sigma / jnp.maximum(sq, 1e-30)
    return jnp.einsum("p,pd->d", w, eps)


def combine_gradient_chunked(
    noise: CounterNoise, epoch, member_ids: jnp.ndarray, fitness: jnp.ndarray, sigma: float, chunk: int
) -> jnp.ndarray:
    """Memory-bounded combine: regenerates noise chunk-by-chunk from counter
    ids inside a scan, so peak memory is chunk x d instead of P x d."""
    P = member_ids.shape[0]
    assert P % chunk == 0, "population must divide by chunk"
    ids = member_ids.reshape(P // chunk, chunk)
    fit = fitness.reshape(P // chunk, chunk)

    def body(acc, args):
        ids_c, fit_c = args
        eps = jax.vmap(lambda i: noise.generate(epoch, i))(ids_c)
        return acc + combine_gradient(eps, fit_c, sigma), None

    g0 = jnp.zeros((noise.n_params,), jnp.float32)
    g, _ = jax.lax.scan(body, g0, (ids, fit))
    return g
