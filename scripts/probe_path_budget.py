"""Asset-PATH frame budget cross-check: implied chunk-invocation count.

Direct runtime counting of _walk_chunk invocations is impossible on this
stack (axon_pjrt rejects jax.debug.callback, and the chunks run under a
dynamic-trip while_loop so trace-time counting is meaningless).  Instead
the count is IMPLIED by a controlled per-chunk cost delta:

  scripts/probe_select_cost.py (slope-amortized, LICM-defeated) measures
  _select_cells at the asset chunk shape: scattered take 1.32 ms/chunk
  vs z-row gather 0.43 ms/chunk — a 0.89 ms/chunk exact swap.
  scripts/bench_path_sort.py --asset measured the frame at 1178.7 ms
  (take) and 1009.5 ms (z-row), identical checksums.

  implied invocations = 169.2 ms / 0.89 ms/chunk  ~=  190 chunks/frame

Consistency: 190 chunks x ~1.5 mean blocks/ray unit costs (~5-6 ms/chunk
mixed trips, probe_walk_chunk_asset.py) ~= the ~1010 ms frame — the
walk-work-bound attribution holds with the select overhead removed.

This script just re-derives the arithmetic from the two committed
artifacts so the claim has a runnable record; it needs no TPU.
"""
from __future__ import annotations

TAKE_MS, ZROW_MS = 1.322, 0.430          # probe_select_cost.py (v5e)
FRAME_TAKE, FRAME_ZROW = 1178.7, 1009.5  # bench_path_sort.py --asset

per_chunk = TAKE_MS - ZROW_MS
delta = FRAME_TAKE - FRAME_ZROW
k = delta / per_chunk
print(f"select swap saves {per_chunk:.3f} ms/chunk; frame saved {delta:.1f} ms")
print(f"implied _walk_chunk invocations per 512^2 asset frame: {k:.0f}")
