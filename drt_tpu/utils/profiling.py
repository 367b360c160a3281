"""Profiling & throughput counters (SURVEY.md §5 "Tracing / profiling").

The reference has no profiling at all. Here: `jax.profiler` trace capture
(Perfetto/TensorBoard-compatible) plus a blocking timer utility that
reports rays/s for renderer workloads.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, warmup: int = 1, reps: int = 3):
    """Best-of-reps wall-clock of a jitted function (blocks on readiness).
    Returns (best_seconds, last_output)."""
    out = None
    for _ in range(max(warmup, 0)):
        out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def rays_per_second(n_rays: int, seconds: float) -> float:
    return n_rays / seconds


def mrays_per_second(n_rays: int, seconds: float) -> float:
    return n_rays / seconds / 1e6
