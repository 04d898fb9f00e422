"""Bounded behavioral-diversity archive (reference
strategy/sparse_history_manager.py:6-149).

Keeps at most ``max_history_size`` policy snapshots, chosen for behavioral
spread: once full, a candidate replaces an archived point only if its novelty
(min distance to the archive) exceeds the distance of the archive's current
closest pair; the evicted member is whichever of that pair has the smaller
second-nearest-neighbor distance.  A full pairwise distance table plus
per-point nearest/2nd-nearest caches make replacement O(H) per candidate.

This stays host-side numpy on purpose: the archive is tiny (<= 200 points),
sequential, and data-dependent — exactly what does not belong under jit.  The
expensive part (evaluating strategies over zeta) is a device-batched forward
supplied by the caller.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from dfd_tpu.novelty.point import StrategyPoint


class SparseHistoryArchive:
    def __init__(self, evaluator, distance_fn, max_history_size: int):
        """``evaluator(flat, zeta) -> [Z, F]``; ``distance_fn(a, b) -> float``
        per archived strategy (broadcasting over a leading archive axis)."""
        self._evaluator = evaluator
        self.distance_fn = distance_fn
        self.max_history_size = max_history_size
        self.points: List[StrategyPoint] = []
        self.strategy_tensor: np.ndarray | list = []
        self.zeta = []
        self.known_dists: Dict[Tuple[int, int], float] = {}
        self.worst_point_idx = 0

    def __len__(self) -> int:
        return len(self.points)

    # -- submission --------------------------------------------------------------

    def submit(self, flat: np.ndarray) -> Optional[int]:
        """Offer a policy snapshot.  Returns the replaced index, -1 for a
        rejected candidate, or None when simply appended (archive not full)."""
        point = StrategyPoint(self._evaluator, flat)
        if len(self.points) >= self.max_history_size and self.zeta is not None and len(self.zeta) > 0:
            return self._replace(point)
        self.points.append(point)
        return None

    # -- (re-)evaluation over a new zeta ------------------------------------------

    def evaluate_strategies(self, zeta) -> np.ndarray:
        self.zeta = zeta
        strategies = [p.evaluate_strategy(zeta) for p in self.points]
        self._build_table()
        self.strategy_tensor = np.asarray(strategies)
        return self.strategy_tensor

    # -- internals ---------------------------------------------------------------

    def _distance(self, a: np.ndarray, b: np.ndarray) -> float:
        return float(self.distance_fn(a, b))

    def _build_table(self) -> None:
        n = len(self.points)
        table: Dict[Tuple[int, int], float] = {}
        for i in range(n):
            for j in range(i + 1, n):
                table[(i, j)] = self._distance(self.points[i].strategy, self.points[j].strategy)
        self.known_dists = table
        self._refresh_point_dists()

    def _replace(self, point: StrategyPoint) -> int:
        strategy = point.evaluate_strategy(self.zeta)
        dists = np.asarray(self.distance_fn(strategy, np.asarray(self.strategy_tensor)))
        novelty = float(np.min(dists))

        idx = self.worst_point_idx
        current_worst = self.points[idx].closest[1]
        if novelty > current_worst or current_worst == np.inf:
            self.points[idx] = point
            self.strategy_tensor[idx] = strategy
            for pair in self.known_dists:
                if idx in pair:
                    other = pair[1 - pair.index(idx)]
                    self.known_dists[pair] = float(dists[other])
            self._refresh_point_dists()
            return idx
        return -1

    def _refresh_point_dists(self) -> None:
        points = self.points
        for i, p in enumerate(points):
            p.reset_dists()
            for key, val in self.known_dists.items():
                if i in key:
                    p.add_dist(key, val)

        # locate the least-novel member: the closest pair's element with the
        # smaller 2nd-nearest distance (reference :111-149)
        worst_dist = np.inf
        for i, p in enumerate(points):
            closest = p.closest
            if closest[1] < worst_dist:
                if closest[0] is None:
                    self.worst_point_idx = i
                    continue
                other = closest[0][1 - closest[0].index(i)]
                worst_dist = closest[1]
                if points[i].second_closest[1] < points[other].second_closest[1]:
                    self.worst_point_idx = i
                else:
                    self.worst_point_idx = other
