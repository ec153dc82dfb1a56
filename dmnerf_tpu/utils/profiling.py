"""Profiling / observability helpers.

The reference has no tracing at all (SURVEY.md §5 — only per-image wall-clock
prints). Here: jax.profiler trace capture around training windows and a simple
throughput meter used by the train loop (rays/sec is the BASELINE.md
north-star metric).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Windowed rays/sec + step-time tracker."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._rays = 0
        self._steps = 0

    def update(self, n_rays: int):
        self._rays += n_rays
        self._steps += 1

    @property
    def rays_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._rays / dt if dt > 0 else 0.0

    @property
    def ms_per_step(self) -> float:
        dt = time.perf_counter() - self._t0
        return 1000.0 * dt / self._steps if self._steps else 0.0
