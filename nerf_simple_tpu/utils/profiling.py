"""Profiling + observability.

The reference has no tracing/profiling at all (SURVEY.md §5 — only tqdm
bars). Here: a rays/sec + iters/sec throughput meter for the train loop,
and a ``jax.profiler`` trace context manager for capturing device traces
viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time


class Throughput:
    """Windowed throughput meter: call ``tick(n_iters, n_rays)`` after each
    device-synchronized chunk."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.iters = 0
        self.rays = 0

    def tick(self, n_iters: int, n_rays: int) -> None:
        self.iters += n_iters
        self.rays += n_rays

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def iters_per_sec(self) -> float:
        return self.iters / max(self.elapsed, 1e-9)

    @property
    def rays_per_sec(self) -> float:
        return self.rays / max(self.elapsed, 1e-9)

    def reset(self) -> None:
        self.t0 = time.perf_counter()
        self.iters = 0
        self.rays = 0


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
