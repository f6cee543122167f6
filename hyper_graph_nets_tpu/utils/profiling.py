"""Profiling / tracing utilities (SURVEY.md §5 auxiliary subsystems).

The reference only wall-clocks training instances into W&B
(reference src/algorithms/MeshSimulator.py:135-156).  TPU-native equivalents:

- :func:`trace` — context manager around ``jax.profiler`` producing an XPlane
  trace viewable in TensorBoard / Perfetto;
- :class:`ThroughputMeter` — running edges/s / steps/s counters (the
  BASELINE metric) for the metrics stream;
- :func:`annotate` — named trace regions (jax.profiler.TraceAnnotation).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('out/trace'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the device trace."""
    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Running edges/s / steps/s over a sliding window."""

    def __init__(self, edges_per_step: int, window: int = 50):
        self.edges_per_step = edges_per_step
        self.window = window
        self._times = []

    def tick(self) -> Optional[dict]:
        now = time.perf_counter()
        self._times.append(now)
        if len(self._times) > self.window:
            self._times.pop(0)
        if len(self._times) < 2:
            return None
        dt = (self._times[-1] - self._times[0]) / (len(self._times) - 1)
        return {
            "steps_per_s": 1.0 / dt,
            "edges_per_s": self.edges_per_step / dt,
        }
