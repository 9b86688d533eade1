"""Profiling hooks.

The reference's only instrumentation is wall-clock around ``sess.run``
(/root/reference/model/train_single_gpu.py:142,152).  Here: the same
sec/batch counters plus ``jax.profiler`` trace capture for real device
timelines (xplane traces viewable in TensorBoard/XProf or Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Rolling wall-clock stats; call ``tick()`` around each step."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self.last = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.last = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += self.last

    @property
    def mean(self) -> float:
        n = self.count - self.warmup
        return self.total / n if n > 0 else float("nan")


@contextlib.contextmanager
def trace_context(logdir: Optional[str]):
    """``jax.profiler`` trace when a logdir is given, no-op otherwise."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
