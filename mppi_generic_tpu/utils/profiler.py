"""Tracing / profiling helpers — the TPU analog of the reference's built-in
timing (SURVEY §5: plant wall-clock accounting, base_plant.hpp:102-117, and
the empirical kernel auto-tuner, mppi_controller.cu:45-143).

* ``trace(dir)``: context manager around ``jax.profiler`` — captures an XLA
  trace viewable in TensorBoard/Perfetto (the `nvprof` replacement).
* ``annotate(name)``: TraceAnnotation for host-side phases so plant-loop
  stages show up on the trace timeline.
* ``SolveTimer``: running mean/max wall-clock per named phase — the
  MPPILogger-friendly counterpart of the plant's avg_loop_time bookkeeping.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span on the profiler timeline (host side)."""
    return jax.profiler.TraceAnnotation(name)


class SolveTimer:
    """Per-phase running statistics (mean/max/count), mirroring the plant's
    avg_optimize/feedback/loop accounting (base_plant.hpp:536-563)."""

    def __init__(self):
        self._sum = defaultdict(float)
        self._max = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._sum[name] += dt
            self._max[name] = max(self._max[name], dt)
            self._count[name] += 1

    def mean_ms(self, name: str) -> float:
        c = self._count[name]
        return self._sum[name] / c * 1e3 if c else 0.0

    def max_ms(self, name: str) -> float:
        return self._max[name] * 1e3

    def count(self, name: str) -> int:
        return self._count[name]

    def summary(self) -> dict:
        return {
            name: {
                "mean_ms": self.mean_ms(name),
                "max_ms": self.max_ms(name),
                "count": self._count[name],
            }
            for name in self._count
        }
