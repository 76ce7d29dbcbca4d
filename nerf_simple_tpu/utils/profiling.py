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


class SteadyStateMeter:
    """Driver-facing throughput bookkeeping (train/loop.py).

    The driver reports cumulative progress (``iters_done`` since its own
    start) at each device sync; this class converts that into steady-state
    windowed throughput by (a) excluding everything up to and including
    the FIRST sync — that window contains the jit compile (and, cold, the
    data load) — and (b) feeding exact per-window deltas to ``Throughput``.
    Monotonic ``iters_done`` in, provably-consistent totals out: after any
    sync sequence, ``meter.iters == iters_done - first_sync_iters``.
    """

    def __init__(self, rays_per_iter: int):
        self.rays_per_iter = rays_per_iter
        self.meter = Throughput()
        self._baseline: int | None = None

    def sync(self, iters_done: int) -> None:
        """Record a device sync at cumulative iteration count ``iters_done``."""
        if self._baseline is None:
            self.meter.reset()
            self._baseline = iters_done
            return
        delta = iters_done - self._baseline - self.meter.iters
        self.meter.tick(delta, delta * self.rays_per_iter)

    def discard_warmup(self) -> None:
        """Forget any recorded syncs (e.g. profiling chunks ran first)."""
        self.meter.reset()
        self._baseline = None

    @property
    def iters(self) -> int:
        return self.meter.iters

    @property
    def iters_per_sec(self) -> float:
        return self.meter.iters_per_sec

    @property
    def rays_per_sec(self) -> float:
        return self.meter.rays_per_sec


def chunk_schedule(
    start: int,
    num_iters: int,
    steps_per_call: int,
    boundary_everys: tuple[int, ...],
):
    """The train driver's chunk walk as a pure, testable plan.

    Covers iterations [start, num_iters) with full ``steps_per_call``
    chunks plus one remainder chunk, and marks each chunk ``boundary`` if
    it contains an iteration hitting any cadence in ``boundary_everys``
    (log/image/checkpoint) or is the final chunk — only boundary chunks
    synchronize with the device.

    Yields ``(chunk_start, chunk_len, boundary)``.
    """
    n_total = num_iters - start
    if n_total <= 0:
        return
    remainder = n_total % steps_per_call
    n_chunks = -(-n_total // steps_per_call)
    for c in range(n_chunks):
        chunk_start = start + c * steps_per_call
        last = c == n_chunks - 1
        spc = remainder if (last and remainder) else steps_per_call
        boundary = last or any(
            (chunk_start + j) % every == 0
            for every in boundary_everys
            for j in range(spc)
        )
        yield chunk_start, spc, boundary


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
