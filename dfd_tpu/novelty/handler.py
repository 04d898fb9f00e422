"""Novelty facade (reference strategy/strategy_handler.py:6-31).

Owns the archive and the current zeta, and answers "how novel is this
policy?" — the minimum behavioral distance from the policy's strategy on
zeta to every archived strategy.  Batch variants evaluate a whole population
of perturbations in one device call (the vectorized trainer's path).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfd_tpu.novelty.archive import SparseHistoryArchive


class StrategyHandler:
    def __init__(
        self,
        model,
        bn_state,
        distance_fn: Callable,
        max_history_size: int = 200,
        evaluator: Optional[Callable] = None,
    ):
        """``model``: a PolicyModel; ``bn_state``: the shared non-trainable
        state used when evaluating archived flats; ``distance_fn(a, b)``
        broadcasts over a leading archive axis of ``b``.  ``evaluator`` can
        override how a flat's strategy is computed (testing / alt backends)."""
        self.model = model
        self.bn_state = bn_state
        self.distance_fn = distance_fn
        self.zeta: Optional[np.ndarray] = None
        self._evaluator = evaluator or self._evaluate_flat
        self.archive = SparseHistoryArchive(self._evaluator, distance_fn, max_history_size)

    # -- archive management ------------------------------------------------------

    def add_policy(self, flat: np.ndarray):
        return self.archive.submit(flat)

    def set_zeta(self, zeta) -> None:
        if zeta is None or len(zeta) == 0:
            return
        self.zeta = np.asarray(zeta)
        self.archive.evaluate_strategies(self.zeta)

    @property
    def strategy_tensor(self):
        t = self.archive.strategy_tensor
        return t if isinstance(t, np.ndarray) else np.zeros(0)

    # -- queries -----------------------------------------------------------------

    def compute_novelty(self, flat: np.ndarray) -> float:
        if self.zeta is None or len(self.zeta) == 0 or len(self.strategy_tensor) < 2:
            return 0.0
        strategy = self._evaluator(flat, self.zeta)
        dists = self.distance_fn(strategy, self.strategy_tensor)
        return float(np.min(dists))

    def compute_novelty_batch(self, flats: jnp.ndarray, zeta: jnp.ndarray) -> jnp.ndarray:
        """Novelty for a stacked population of flats in one jitted call."""
        if self.zeta is None or len(self.strategy_tensor) < 2:
            return jnp.zeros(flats.shape[0], jnp.float32)
        archive = jnp.asarray(self.strategy_tensor)

        def one(flat):
            params = self.model.set_flat(flat, xp=jnp)
            strat = self.model.strategy(params, self.bn_state, zeta)
            return jnp.min(self.distance_fn(strat, archive, xp=jnp))

        return jax.vmap(one)(flats)

    # -- internals ---------------------------------------------------------------

    def _evaluate_flat(self, flat, zeta) -> np.ndarray:
        params = self.model.set_flat(np.asarray(flat), xp=np)
        return np.asarray(self.model.strategy(params, self.bn_state, jnp.asarray(zeta)))
