"""Pure layer functions shared by the policy models.

Parameters follow the torch memory layout (Linear weights are (out, in)) so
that flat-parameter views match the reference's ``parameters_to_vector``
ordering element-for-element (reference policies/policy.py:36-42).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def linear(p: Dict[str, jnp.ndarray], x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """x @ w.T + b.  ``compute_dtype`` (e.g. bf16) casts the GEMM operands
    only; accumulation and bias stay f32 (the MXU's native mixed mode)."""
    if compute_dtype is not None:
        return jnp.dot(
            x.astype(compute_dtype), p["w"].T.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) + p["b"]
    return x @ p["w"].T + p["b"]


def batchnorm_eval(p: Dict[str, jnp.ndarray], s: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """BatchNorm in inference mode: normalize by running statistics."""
    return (x - s["mean"]) / jnp.sqrt(s["var"] + BN_EPS) * p["w"] + p["b"]


def batchnorm_train(
    p: Dict[str, jnp.ndarray], s: Dict[str, jnp.ndarray], x: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """BatchNorm in training mode over the leading batch axis.

    Normalizes by *batch* statistics (biased variance) and folds them into the
    running statistics with momentum 0.1 (unbiased variance), exactly torch's
    update rule — this is the VBN refresh path (reference policies/policy.py:31-34).
    """
    n = x.shape[0]
    mean_b = x.mean(axis=0)
    var_biased = ((x - mean_b) ** 2).mean(axis=0)
    y = (x - mean_b) / jnp.sqrt(var_biased + BN_EPS) * p["w"] + p["b"]
    var_unbiased = var_biased * (n / max(n - 1, 1))
    new_s = {
        "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean_b,
        "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * var_unbiased,
        "n": s["n"] + 1,
    }
    return y, new_s


def softmax(x: jnp.ndarray) -> jnp.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = jnp.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def categorical_entropy(probs: jnp.ndarray) -> jnp.ndarray:
    """-sum p log p per row (0 log 0 := 0), matching torch's clamped form."""
    plogp = jnp.where(probs > 0, probs * jnp.log(jnp.where(probs > 0, probs, 1.0)), 0.0)
    return -plogp.sum(axis=-1)


def gaussian_entropy(std: jnp.ndarray) -> jnp.ndarray:
    """Per-dimension Normal entropy 0.5 + 0.5 log(2 pi) + log std."""
    return 0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std)


def map_continuous_to_action(y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tanh head: first half is the mean in [-1,1]; second half maps to a
    stddev in [0.1, 1.0] (reference utils/torch_helpers.py:15-25)."""
    t = jnp.tanh(y)
    n = t.shape[-1] // 2
    return t[..., :n], 0.55 + 0.45 * t[..., n:]
