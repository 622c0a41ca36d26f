"""Profiling / tracing as a first-class module.

The reference scatters ad-hoc ``time.time()`` deltas through its train
loop and model code (reference ``train.py:186,216-229``,
``cnn2.py:158-217``; SURVEY.md §5.1). Here:
  - ``Timer`` / ``StepTimer``: structured wall-time + throughput meters
  - ``trace``: context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timer:
    """Accumulating named section timer."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1000 * self.totals[k] / max(1, self.counts[k]),
            }
            for k in self.totals
        }


class StepTimer:
    """Step-time / items-per-second meter with warmup skip."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.steps = 0
        self.items = 0
        self.elapsed = 0.0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_items: int = 1):
        dt = time.perf_counter() - self._t0
        self.steps += 1
        if self.steps > self.warmup:
            self.items += n_items
            self.elapsed += dt
        return dt

    @property
    def items_per_sec(self) -> float:
        return self.items / self.elapsed if self.elapsed else 0.0

    @property
    def mean_step_ms(self) -> float:
        steps = self.steps - self.warmup
        return 1000 * self.elapsed / steps if steps > 0 else 0.0


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace via jax.profiler (open with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
