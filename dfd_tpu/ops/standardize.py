"""Scalar/vector normalization primitives (reference utils/math_helpers.py:127-144)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def standardize(arr, xp=np):
    """(x - mean)/std; returns x unchanged when std == 0.

    Host (numpy) form is branchy like the reference; the jnp form is
    branch-free for use under jit.
    """
    x = xp.asarray(arr)
    m = x.mean()
    s = x.std()
    if xp is np:
        if s == 0:
            return x
        return (x - m) / s
    safe = jnp.where(s == 0, 1.0, s)
    return jnp.where(s == 0, x, (x - m) / safe)


def affine_transform(value, from_min, from_max, to_min, to_max):
    """Map ``value`` from [from_min, from_max] to [to_min, to_max].

    Degenerate ranges collapse to ``to_min`` (matching the reference's guard).
    Works on python scalars and jnp tracers alike when ranges are static.
    """
    if from_max == from_min or to_max == to_min:
        return to_min
    return (value - from_min) * (to_max - to_min) / (from_max - from_min) + to_min
