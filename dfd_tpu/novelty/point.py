"""An archived policy snapshot and its nearest-neighbor bookkeeping
(reference strategy/strategy_point.py:6-39)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class StrategyPoint:
    def __init__(self, evaluator, flat: np.ndarray):
        """``evaluator(flat, zeta) -> strategy [Z, F]`` (a device-batched
        forward through the shared policy model)."""
        self.flat = np.asarray(flat).copy()
        self._evaluator = evaluator
        self.strategy: Optional[np.ndarray] = None
        self.closest: list = [None, np.inf]          # [pair key, distance]
        self.second_closest: list = [None, np.inf]
        self.reset_dists()

    def evaluate_strategy(self, zeta) -> np.ndarray:
        self.strategy = np.asarray(self._evaluator(self.flat, zeta))
        return self.strategy

    def add_dist(self, key: Tuple[int, int], dist: float) -> None:
        if dist < self.closest[1]:
            self.second_closest = self.closest[:]
            self.closest = [key, dist]
        elif dist < self.second_closest[1] and key != self.closest[0]:
            self.second_closest = [key, dist]

    def reset_dists(self) -> None:
        self.closest = [None, np.inf]
        self.second_closest = [None, np.inf]
