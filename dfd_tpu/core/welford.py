"""Streaming observation statistics (Welford / Chan parallel merge).

Two implementations of the same math:

- :class:`Welford` — a host-side numpy implementation whose arithmetic
  (dtypes, operation order, count<2 guards, zero-variance guard) matches the
  reference's ``WelfordRunningStat`` (reference utils/math_helpers.py:7-124)
  bit-for-bit, for the parity path and for host-side global stats in the
  elastic distributed topology.

- functional jnp ops (:func:`jnp_init`, :func:`jnp_update_batch`,
  :func:`jnp_merge`, :func:`jnp_mean_std`) — a jit-able pytree form used
  inside the vectorized trainer, where per-perturbation sampled updates are
  tree-merged across the population (the SPMD analogue of every worker
  shipping a Welford delta to the server, reference run_server.py:143).

The merge is the standard parallel-variance combination: given two partial
statistics (count, mean, M2) the combined M2 adds a ``delta^2 * n_a n_b / n``
cross term.  It is associative up to floating point, which is what makes the
population-tree reduction and the cross-host ``psum``-style merge valid.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Welford:
    """Host-side running mean/variance with mergeable partial updates."""

    def __init__(self, shape):
        self.shape = shape
        self.running_mean = np.zeros(shape, dtype=np.float32)
        self.running_variance = np.zeros(shape, dtype=np.float32)  # sum of squared deviations (M2)
        self.count = 0

    # -- single / batched updates ------------------------------------------------

    def update(self, sample) -> None:
        if isinstance(sample, dict):  # IMPALA-style dict observations
            sample = sample["frame"]
        prev = self.count
        self.count += 1
        delta = (np.asarray(sample) - self.running_mean).reshape(self.running_mean.shape)
        delta_n = (delta / self.count).reshape(self.running_mean.shape)
        self.running_mean += delta_n
        self.running_variance += delta * delta_n * prev

    def increment(self, samples, num: int) -> None:
        if num > 1:
            for i in range(num):
                self.update(samples[i])
        else:
            self.update(samples)

    def reset(self) -> None:
        self.__init__(self.shape)

    # -- guarded views -----------------------------------------------------------

    @property
    def mean(self) -> np.ndarray:
        if self.count < 2:
            return np.zeros(self.shape, dtype=np.float32)
        return self.running_mean

    @property
    def std(self) -> np.ndarray:
        if self.count < 2:
            return np.ones(self.shape, dtype=np.float32)
        var = self.running_variance / (self.count - 1)
        # A zero-variance feature is constant; dividing by 1 leaves it constant
        # and (x - mean)/std then standardizes it to exactly zero.
        var = np.where(var == 0, 1.0, var)
        return np.sqrt(var)

    # -- parallel merge ----------------------------------------------------------

    def merge_serialized(self, update) -> None:
        """Fold a serialized partial statistic (``serialize()`` format) in."""
        n = int(np.prod(self.shape))
        other_mean = np.asarray(update[:n], dtype=np.float32).reshape(self.running_mean.shape)
        other_m2 = np.asarray(update[n:-1], dtype=np.float32).reshape(self.running_variance.shape)
        other_count = update[-1]
        if other_count == 0:
            return
        total = self.count + other_count
        delta = other_mean - self.running_mean
        self.running_mean = (self.count * self.running_mean + other_count * other_mean) / total
        self.running_variance = (
            self.running_variance + other_m2 + delta * delta * self.count * other_count / total
        )
        self.count = total

    # -- wire format -------------------------------------------------------------

    def serialize(self):
        return (
            self.running_mean.ravel().tolist()
            + self.running_variance.ravel().tolist()
            + [self.count]
        )

    def deserialize(self, data) -> None:
        self.reset()
        n = int(np.prod(self.shape))
        self.running_mean = np.reshape(np.asarray(data[:n], dtype=np.float32), self.shape)
        self.running_variance = np.reshape(np.asarray(data[n:-1], dtype=np.float32), self.shape)
        self.count = data[-1]


# ---------------------------------------------------------------------------
# Functional jnp form (jit-able, vmap-able, mergeable across a mesh axis)
# ---------------------------------------------------------------------------


class WelfordState(NamedTuple):
    mean: jnp.ndarray   # running mean, shape = obs shape
    m2: jnp.ndarray     # sum of squared deviations
    count: jnp.ndarray  # scalar float32


def jnp_init(shape) -> WelfordState:
    return WelfordState(
        mean=jnp.zeros(shape, jnp.float32),
        m2=jnp.zeros(shape, jnp.float32),
        count=jnp.zeros((), jnp.float32),
    )


def jnp_update_batch(state: WelfordState, xs: jnp.ndarray, mask: jnp.ndarray) -> WelfordState:
    """Fold a batch of samples (leading axis) with a 0/1 per-sample mask.

    Implemented as a batch-statistics merge: compute (count, mean, M2) of the
    masked batch in one shot, then Chan-merge into the running state.  This is
    mathematically identical to sample-by-sample Welford and keeps the device
    op count independent of batch size.
    """
    mask = mask.astype(jnp.float32)
    n_b = jnp.sum(mask)
    w = mask.reshape((-1,) + (1,) * (xs.ndim - 1))
    safe_n = jnp.maximum(n_b, 1.0)
    mean_b = jnp.sum(xs * w, axis=0) / safe_n
    m2_b = jnp.sum(w * (xs - mean_b) ** 2, axis=0)
    batch = WelfordState(mean=mean_b, m2=m2_b, count=n_b)
    return jnp_merge(state, batch)


def jnp_merge(a: WelfordState, b: WelfordState) -> WelfordState:
    total = a.count + b.count
    safe_total = jnp.maximum(total, 1.0)
    delta = b.mean - a.mean
    mean = (a.count * a.mean + b.count * b.mean) / safe_total
    m2 = a.m2 + b.m2 + delta * delta * a.count * b.count / safe_total
    # If either side is empty, keep the other side untouched.
    mean = jnp.where(total > 0, mean, a.mean)
    m2 = jnp.where(total > 0, m2, a.m2)
    return WelfordState(mean=mean, m2=m2, count=total)


def jnp_merge_population(states: WelfordState) -> WelfordState:
    """Merge a population-stacked WelfordState (leading axis) into one."""

    def body(carry, item):
        return jnp_merge(carry, item), None

    first = jax.tree.map(lambda x: x[0], states)
    rest = jax.tree.map(lambda x: x[1:], states)
    merged, _ = jax.lax.scan(body, first, rest)
    return merged


def jnp_mean_std(state: WelfordState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Guarded (mean, std) matching the reference's count<2 / zero-var rules."""
    have = state.count >= 2
    mean = jnp.where(have, state.mean, jnp.zeros_like(state.mean))
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    var = jnp.where(var == 0, 1.0, var)
    std = jnp.where(have, jnp.sqrt(var), jnp.ones_like(var))
    return mean, std
