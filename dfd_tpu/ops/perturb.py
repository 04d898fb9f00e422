"""Pallas TPU kernels for the perturbation pipeline.

The jnp path materializes the population noise matrix eps [P, d] in HBM and
reads it twice (perturb + combine).  For large P x d that traffic dominates;
these kernels regenerate the noise *on-chip* from counters instead:

- :func:`pallas_perturb`   — theta_i = theta + sigma * eps(i), with eps
  produced inside the kernel from a keyed counter hash of
  (base_seed, epoch, member, chunk, lane);
- :func:`pallas_combine`   — g = sum_i a_i * eps(i) with the *same* in-kernel
  regeneration, so the only HBM traffic is theta-sized.

Both kernels share :func:`_noise_tile` (Box-Muller over a murmur3-finalizer
counter hash in pure integer jnp ops), so the stream is bit-identical
between them and across backends — CPU interpret mode included, unlike
``pltpu.prng_random_bits`` which has no CPU lowering.  The stream
intentionally differs from ``jax.random.normal``: the backend is selected
for the whole trainer via ``TrainConfig.noise_backend`` so perturb and
combine always use the same scheme.

Blocks process MROW=8 members x chunk lanes per grid step (the TPU lowering
requires the trailing block dims to be multiples of (8, 128)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MROW = 8           # members per block (sublane multiple)
DEFAULT_CHUNK = 1024


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _fmix32(x):
    """murmur3 32-bit finalizer — full avalanche on the VPU's integer path."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _noise_tile(base_seed, epoch, member_block, chunk_idx, chunk, d, antithetic=False):
    """f32[MROW, chunk] standard normals for members
    [member_block*MROW, ...+MROW), zeroed past feature d.

    Deterministic in (base_seed, epoch, member, chunk_idx, lane); identical
    in the perturb and combine kernels and across backends.  With
    ``antithetic`` members 2k/2k+1 share the draw of pair k with opposite
    signs (mirroring CounterNoise's antithetic id->vector map).
    """
    u32 = lambda v: jnp.asarray(v).astype(jnp.uint32)
    raw_members = (
        member_block * MROW
        + jax.lax.broadcasted_iota(jnp.int32, (MROW, 1), 0)
    )  # [MROW, 1] int32
    if antithetic:
        members = (raw_members // 2).astype(jnp.uint32)
        sign = jnp.where(raw_members % 2 == 0, 1.0, -1.0).astype(jnp.float32)
    else:
        members = raw_members.astype(jnp.uint32)
        sign = None
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1).astype(jnp.uint32)

    base = _fmix32(u32(base_seed) * jnp.uint32(0x9E3779B9) ^ u32(epoch))
    key = _fmix32(base ^ members * jnp.uint32(0x85EBCA6B))          # [MROW, 1]
    key = _fmix32(key ^ u32(chunk_idx) * jnp.uint32(0xC2B2AE35))

    mix = lane * jnp.uint32(0x9E3779B9) ^ key                        # [MROW, chunk]
    bits1 = _fmix32(mix ^ jnp.uint32(0x1234567))
    bits2 = _fmix32(mix ^ jnp.uint32(0x89ABCDE))
    # uniforms in (0, 1): 24 mantissa-grade bits, nudged off zero
    # (values < 2^24, so the int32 hop is lossless — Mosaic has no u32->f32 cast)
    u1 = (bits1 >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-7
    u2 = (bits2 >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    if sign is not None:
        z = z * sign

    idx = jax.lax.broadcasted_iota(jnp.int32, (MROW, chunk), 1) + chunk_idx * chunk
    return jnp.where(idx < d, z, 0.0)


def _perturb_kernel(seed_ref, flat_ref, out_ref, *, sigma, chunk, d, antithetic):
    mb = pl.program_id(0)
    c = pl.program_id(1)
    eps = _noise_tile(seed_ref[0], seed_ref[1], mb, c, chunk, d, antithetic)
    out_ref[:, :] = flat_ref[:][None, :] + sigma * eps


def _combine_kernel(seed_ref, coef_ref, out_ref, *, chunk, d, antithetic):
    c = pl.program_id(0)
    mb = pl.program_id(1)

    @pl.when(mb == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    eps = _noise_tile(seed_ref[0], seed_ref[1], mb, c, chunk, d, antithetic)
    # SMEM only serves scalar loads: unroll the MROW coefficient reads
    coefs = jnp.stack([coef_ref[mb * MROW + r] for r in range(MROW)])
    out_ref[:, :] = out_ref[:, :] + coefs[:, None] * eps


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("sigma", "P", "chunk", "d", "interpret", "antithetic")
)
def _perturb_call(flat_padded, seeds, sigma, P, chunk, d, interpret, antithetic):
    dp = flat_padded.shape[0]
    n_chunks = dp // chunk
    Pp = _ceil_to(P, MROW)
    out = pl.pallas_call(
        functools.partial(
            _perturb_kernel, sigma=float(sigma), chunk=chunk, d=d, antithetic=antithetic
        ),
        grid=(Pp // MROW, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk,), lambda i, c: (c,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((MROW, chunk), lambda i, c: (i, c), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, dp), jnp.float32),
        interpret=interpret,
    )(seeds, flat_padded)
    return out


def pallas_perturb(
    flat, sigma, base_seed, epoch, P: int, chunk: int = DEFAULT_CHUNK, interpret=None,
    antithetic: bool = False,
):
    """(perturbed [P, d], noise_sumsq [P]) with on-chip noise generation."""
    if interpret is None:
        interpret = not _on_tpu()
    d = flat.shape[0]
    dp = _ceil_to(d, chunk)
    flat_padded = jnp.pad(jnp.asarray(flat, jnp.float32), (0, dp - d))
    seeds = jnp.stack(
        [jnp.asarray(base_seed, jnp.int32), jnp.asarray(epoch, jnp.int32)]
    )
    out = _perturb_call(flat_padded, seeds, float(sigma), P, chunk, d, interpret, antithetic)
    out = out[:P, :d]
    diff = out - jnp.asarray(flat, jnp.float32)[None, :]
    ssq = jnp.sum(diff * diff, axis=1) / (sigma * sigma)  # ||eps_i||^2, XLA-fused
    return out, ssq


@functools.partial(jax.jit, static_argnames=("d", "chunk", "interpret", "antithetic"))
def _combine_call(coefs_padded, seeds, d, chunk, interpret, antithetic):
    Pp = coefs_padded.shape[0]
    dp = _ceil_to(d, chunk)
    n_chunks = dp // chunk
    g = pl.pallas_call(
        functools.partial(_combine_kernel, chunk=chunk, d=d, antithetic=antithetic),
        grid=(n_chunks, Pp // MROW),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((MROW, chunk), lambda c, i: (0, c), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((MROW, dp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(seeds, coefs_padded)
    return g.sum(axis=0)[:d]


def pallas_combine(
    coefs, base_seed, epoch, d: int, chunk: int = DEFAULT_CHUNK, interpret=None,
    antithetic: bool = False,
):
    """g[d] = sum_i coefs[i] * eps(i)[d], regenerating eps on-chip.

    For the FD estimator pass ``coefs = fitness / (sigma * noise_sumsq)``
    (so g equals sum_i fitness_i * sigma*eps_i / ||sigma*eps_i||^2).
    """
    if interpret is None:
        interpret = not _on_tpu()
    coefs = jnp.asarray(coefs, jnp.float32)
    P = coefs.shape[0]
    Pp = _ceil_to(P, MROW)
    coefs_padded = jnp.pad(coefs, (0, Pp - P))  # zero coef => padded members drop out
    seeds = jnp.stack(
        [jnp.asarray(base_seed, jnp.int32), jnp.asarray(epoch, jnp.int32)]
    )
    return _combine_call(coefs_padded, seeds, d, chunk, interpret, antithetic)
