"""Wall-clock benchmarking helpers (the reference has no profiling at all —
SURVEY.md §5.1; this is the jax.profiler/block_until_ready replacement for
Vulkan timestamp queries it never had)."""

from __future__ import annotations

import time

import jax


def time_fn(fn, *args, warmup: int = 2, iters: int = 5, **kwargs):
    """Median wall-clock seconds of ``fn(*args)`` with compile excluded."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def mrays_per_sec(width: int, height: int, seconds: float) -> float:
    return width * height / seconds / 1e6
