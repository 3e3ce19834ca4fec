"""Tracing / profiling helpers (SURVEY.md §5.1 — the reference has no
timestamps, query pools, or counters; this is the TPU-native observability
surface: jax.profiler traces + frame statistics)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class FrameStats:
    """Rolling frame statistics — the FPS counter the reference never had."""

    window: int = 32
    _times: list = field(default_factory=list)
    _last: float | None = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def fps(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    def mrays_per_sec(self, width: int, height: int) -> float:
        return self.fps * width * height / 1e6


def device_memory_stats() -> dict:
    """Per-device HBM usage, when the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
