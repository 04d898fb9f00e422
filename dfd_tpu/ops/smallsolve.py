"""Unrolled dense solvers for tiny SPD systems.

XLA lowers ``jnp.linalg.solve`` on TPU to an LU custom call whose inner
pivoting loop is sequential and scalar-heavy — for the batched 9x9 systems
of the JAX-native physics envs (envs/swimmer.py) it dominates the whole
simulation step.  A Cholesky factorization unrolled at trace time turns the
same solve into ~n^2 fused vector ops over the batch, which is what the VPU
wants: every op below is elementwise over the leading batch dims with static
indices, so XLA fuses the entire solve into a handful of kernels.

Intended for n <= ~16 (the unrolled op count grows as n^2).
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of SPD ``A [..., n, n]``, loop-free at runtime.

    The column recurrence is unrolled over the (static) dimension n; each
    iteration is a batched vector op, so the factorization compiles to a
    short chain of fusions instead of a sequential LU custom call.
    """
    n = A.shape[-1]
    cols = []  # cols[j] = full column j of L, rows < j zeroed
    for j in range(n):
        r = A[..., :, j]
        for k in range(j):
            r = r - cols[k] * cols[k][..., j : j + 1]
        diag = jnp.sqrt(r[..., j : j + 1])
        col = r / diag
        # zero the strictly-upper part of this column
        col = jnp.concatenate(
            [jnp.zeros_like(col[..., :j]), col[..., j:]], axis=-1
        )
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def solve_triangular_lower_unrolled(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``L y = b`` for lower-triangular L [..., n, n], b [..., n]."""
    n = L.shape[-1]
    ys = []
    for i in range(n):
        acc = b[..., i]
        for k in range(i):
            acc = acc - L[..., i, k] * ys[k]
        ys.append(acc / L[..., i, i])
    return jnp.stack(ys, axis=-1)


def solve_triangular_upper_unrolled(U: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``U x = b`` for upper-triangular U [..., n, n], b [..., n]."""
    n = U.shape[-1]
    xs = [None] * n
    for i in reversed(range(n)):
        acc = b[..., i]
        for k in range(i + 1, n):
            acc = acc - U[..., i, k] * xs[k]
        xs[i] = acc / U[..., i, i]
    return jnp.stack(xs, axis=-1)


def spd_solve_unrolled(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = A^-1 b for SPD ``A [..., n, n]``, ``b [..., n]`` via unrolled
    Cholesky + two unrolled triangular substitutions."""
    L = cholesky_unrolled(A)
    y = solve_triangular_lower_unrolled(L, b)
    return solve_triangular_upper_unrolled(jnp.swapaxes(L, -1, -2), y)
