"""Flat-parameter views over param pytrees.

The reference keeps two distinct flat views of a policy (reference
policies/policy.py:36-61):

- the *trainable* view: ``parameters_to_vector`` over trainable parameters
  only, in module registration order — the vector that gets perturbed and
  updated by the learner;
- the *full-state* view: the entire ``state_dict`` flattened (including
  BatchNorm running statistics and ``num_batches_tracked``) — the vector
  shipped over the wire to workers.

Here both are expressed as a :class:`FlatSpec`: an explicit ordered list of
(key-path, shape, dtype) entries over a nested-dict param pytree.  Keeping the
ordering explicit (instead of relying on pytree traversal order) lets us match
the torch orderings bit-for-bit for parity, and gives jit-stable static
slicing for the device path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

KeyPath = Tuple[str, ...]


@dataclasses.dataclass(frozen=True)
class FlatSpec:
    """Ordered description of leaves participating in a flat view."""

    entries: Tuple[Tuple[KeyPath, Tuple[int, ...], Any], ...]

    @classmethod
    def make(cls, entries: Sequence[Tuple[KeyPath, Sequence[int], Any]]) -> "FlatSpec":
        return cls(tuple((tuple(k), tuple(s), d) for k, s, d in entries))

    @property
    def size(self) -> int:
        return sum(int(np.prod(s)) for _, s, _ in self.entries)

    def offsets(self) -> List[Tuple[KeyPath, int, int]]:
        """(path, start, end) for every entry, in order."""
        out = []
        idx = 0
        for path, shape, _ in self.entries:
            n = int(np.prod(shape))
            out.append((path, idx, idx + n))
            idx += n
        return out


def _get(tree: Dict[str, Any], path: KeyPath):
    node = tree
    for k in path:
        node = node[k]
    return node


def _set(tree: Dict[str, Any], path: KeyPath, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def flatten(tree: Dict[str, Any], spec: FlatSpec, xp=jnp):
    """Concatenate the spec's leaves of ``tree`` into one float32 vector."""
    parts = [xp.ravel(xp.asarray(_get(tree, path), dtype=xp.float32)) for path, _, _ in spec.entries]
    return xp.concatenate(parts) if parts else xp.zeros((0,), xp.float32)


def unflatten(vec, spec: FlatSpec, xp=jnp) -> Dict[str, Any]:
    """Inverse of :func:`flatten`; returns a fresh nested dict."""
    tree: Dict[str, Any] = {}
    for path, start, end in spec.offsets():
        shape = next(s for p, s, _ in spec.entries if p == path)
        _set(tree, path, xp.reshape(vec[start:end], shape))
    return tree


def update_from_flat(tree: Dict[str, Any], vec, spec: FlatSpec, xp=jnp) -> Dict[str, Any]:
    """Return a copy of ``tree`` with the spec's leaves replaced from ``vec``.

    Leaves outside the spec (e.g. BatchNorm buffers when using the trainable
    spec) are carried through untouched (by reference; leaves are treated as
    immutable).
    """
    new = _copy_tree(tree)
    shapes = {p: s for p, s, _ in spec.entries}
    for path, start, end in spec.offsets():
        _set(new, path, xp.reshape(vec[start:end], shapes[path]))
    return new


def _copy_tree(tree: Dict[str, Any]) -> Dict[str, Any]:
    return {k: (_copy_tree(v) if isinstance(v, dict) else v) for k, v in tree.items()}
