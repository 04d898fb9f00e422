"""Profiling helpers (SURVEY.md section 5.1: the reference only wall-clocks
whole epochs; here device traces and per-stage timings are first-class).

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of whatever runs inside;
- :class:`StageTimer` — cheap named wall-clock stages (rollout vs combine vs
  host archive work) surfaced into the epoch report as ``_stage/...`` keys
  (underscore-prefixed: logged, console-suppressed).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, reset: bool = True) -> Dict[str, float]:
        out = {f"_stage/{k}": v for k, v in self.totals.items()}
        if reset:
            self.totals.clear()
            self.counts.clear()
        return out
