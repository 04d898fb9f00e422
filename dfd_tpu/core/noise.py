"""Perturbation noise sources.

The wire/bandwidth trick at the heart of the reference's distributed design is
that a perturbation travels as a tiny *encoding*, never as a d-dimensional
vector; the learner regenerates the noise from the encoding (reference
utils/noise_sources.py:4-51, learner/finite_differences.py:87).  This module
provides:

- :class:`CounterNoise` — the TPU-native scheme.  The encoding is a pair of
  integers ``(epoch, member_id)``; noise is regenerated anywhere (any chip,
  any host) as ``normal(fold_in(fold_in(key, epoch), member_id))``.  This is
  the idiomatic JAX analogue of the reference's replayable PCG64 stream: the
  whole pod slice shares the base key, so only scalar fitness crosses hosts.
  Generation is stateless and O(1)-encodable, vmappable over the population
  axis, and identical between the perturbation step and the gradient combine.

- :class:`RNGNoiseSource` / :class:`SimpleNoiseSource` /
  :class:`SharedNoiseTable` — host-side sources with the same observable
  behavior as the reference's three (same encode/decode contract and the same
  underlying numpy streams), used by the sequential parity runner and the
  elastic CPU-client topology.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class CounterNoise:
    """Stateless counter-based Gaussian noise keyed by (epoch, member id).

    With ``antithetic=True`` members form mirrored pairs: ids ``2k`` and
    ``2k+1`` share the draw ``eps_k = normal(key(epoch, k))`` with opposite
    signs, so evaluating both yields the antithetic estimator
    ``(f(theta+sigma*eps) - f(theta-sigma*eps))`` under the unchanged
    fitness-weighted combine.  The pairing lives *here* — in the id->vector
    map — so every consumer (trainer, chunked combine, fat-client shards,
    the learner's decode) regenerates consistently from the same encoding.
    (The reference is strictly one-sided, worker/worker.py:26-30; antithetic
    is the build-side improvement the north star names.)
    """

    def __init__(self, n_params: int, random_seed: int = 123, antithetic: bool = False):
        self.n_params = int(n_params)
        self.base_key = jax.random.key(random_seed)
        self.antithetic = bool(antithetic)

    # device-side ---------------------------------------------------------------

    def member_key(self, epoch, member_id):
        return jax.random.fold_in(jax.random.fold_in(self.base_key, epoch), member_id)

    @partial(jax.jit, static_argnums=0)
    def generate(self, epoch, member_id):
        """f32[d] standard-normal noise for one population member."""
        if not self.antithetic:
            return jax.random.normal(
                self.member_key(epoch, member_id), (self.n_params,), jnp.float32
            )
        member_id = jnp.asarray(member_id)
        sign = jnp.where(member_id % 2 == 0, 1.0, -1.0).astype(jnp.float32)
        eps = jax.random.normal(
            self.member_key(epoch, member_id // 2), (self.n_params,), jnp.float32
        )
        return sign * eps

    def generate_block(self, epoch, member_ids):
        """f32[len(ids), d] — vmapped regeneration for a population shard."""
        return jax.vmap(lambda i: self.generate(epoch, i))(member_ids)

    # reference-style host API ---------------------------------------------------

    def sample(self, epoch: int = 0, member_id: int = 0):
        encoded = "{},{}".format(int(epoch), int(member_id))
        return encoded, np.asarray(self.generate(int(epoch), int(member_id)))

    def decode(self, encoded: str):
        epoch, member_id = (int(x) for x in encoded.split(","))
        return np.asarray(self.generate(epoch, member_id))


class CounterNoiseSampler:
    """Stateful sampling facade over :class:`CounterNoise` for thin workers.

    The Worker's duck-type is ``sample() -> (encoded, noise)`` with no
    arguments; this wraps the stateless counter scheme with a per-client
    member counter (offset by the client's minted seed for global
    uniqueness), so thin clients can feed a counter-mode server — the
    learner regenerates each vector from the "(epoch, member)" encoding.

    The epoch key dimension is live: ``Worker.update`` pushes each broadcast
    FDState's epoch via :meth:`set_epoch`, so encodings are
    "(current epoch, member)".  The member counter stays monotone across
    epochs — uniqueness never depends on the epoch being current, it only
    keeps the encoding scheme aligned with the vectorized trainer's.
    """

    def __init__(self, base: CounterNoise, id_offset: int = 0):
        self.base = base
        self.n_params = base.n_params
        self._next = int(id_offset) & 0x3FFFFFFF
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = max(int(epoch), 0)
        # antithetic pairing is (2k, 2k+1) under the SAME epoch key: if the
        # previous epoch ended on an odd sample count, re-align the counter
        # to even so no mirrored pair straddles an epoch boundary (where the
        # two halves would be drawn from different eps and never cancel)
        if getattr(self.base, "antithetic", False) and self._next % 2:
            self._next = (self._next + 1) & 0x7FFFFFFF

    def sample(self):
        member = self._next
        self._next = (self._next + 1) & 0x7FFFFFFF
        return self.base.sample(epoch=self._epoch, member_id=member)

    def decode(self, encoded: str):
        return self.base.decode(encoded)


class RNGNoiseSource:
    """PCG64-replay noise: encode = the 128-bit generator state.

    Same wire format and stream as the reference's default source
    (utils/noise_sources.py:4-20) — "state,inc" of the PCG64 bit generator —
    but accessed through the modern ``bit_generator.state`` API (the
    reference's ``Generator.__getstate__()`` path returns None on numpy >= 2
    and no longer works)."""

    def __init__(self, n_params: int, random_seed: int = 123):
        self.rng = np.random.default_rng(np.random.SeedSequence(random_seed))
        self._template_state = self.rng.bit_generator.state
        self.n_params = int(n_params)

    def sample(self):
        st = self.rng.bit_generator.state["state"]
        encoded = "{},{}".format(st["state"], st["inc"])
        return encoded, self.rng.standard_normal(size=self.n_params)

    def decode(self, encoded: str):
        state_str, inc_str = encoded.split(",")
        st = dict(self._template_state)
        st["state"] = {"state": int(state_str), "inc": int(inc_str)}
        st["has_uint32"] = 0
        st["uinteger"] = 0
        self.rng.bit_generator.state = st
        return self.rng.standard_normal(size=self.n_params)


class SimpleNoiseSource:
    """Noise ships verbatim (encode = the vector itself)."""

    def __init__(self, n_params: int, random_seed: int = 123):
        self.rng = np.random.RandomState(random_seed)
        self.n_params = int(n_params)

    def sample(self):
        noise = self.rng.randn(self.n_params)
        return noise, noise

    def decode(self, encoded):
        return encoded


class SharedNoiseTable:
    """OpenAI-ES-style pre-generated table; encode = a start index."""

    def __init__(self, size: int, n_params: int, random_seed: int = 123):
        if size <= n_params:
            raise ValueError(
                "noise table size {} must exceed parameter count {}".format(size, n_params)
            )
        self._rng = np.random.RandomState(random_seed)
        self._table = self._rng.randn(size).astype(np.float32)
        self._n_params = int(n_params)
        self._max_sample_idx = size - n_params

    def sample(self):
        idx = self._rng.randint(0, self._max_sample_idx)
        return str(idx), self._table[idx : idx + self._n_params]

    def decode(self, encoded):
        idx = int(encoded)
        return self._table[idx : idx + self._n_params]
