"""PATH 1080p after the per-segment overhead fixes (round 4):

scripts/probe_path_breakdown.py attributed 412 ms of the 954 ms default
frame to FULL-WIDTH per-segment machinery — the _select_cells cost key
(~40 ms/segment) + argsort(2.07M) behind path_sort_chunks, running even
when the alive count is near zero.  This sweep measures the remedies:

  * path_sort_key: "cells" (the round-3 key) vs "span" (one
    intersect_aabb) vs sort off — at 1080p and at 256^2 (where "cells"
    previously won);
  * frame_batch composition with the cheap key;
  * the lax.cond(count>0) segment guard (p=0 attribution should now be
    ~seg1-only).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_path_sortkey.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    print("claiming device...", flush=True)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s", flush=True)

    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.grid import procedural

    grid = procedural.cloud(n=96)
    base = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    def frames(label, W=1920, H=1080, params=base, batch=1, n=4, warm=None,
               **cfg):
        r = Renderer(grid, StaticConfig(width=W, height=H, **cfg), params,
                     algorithm=Algorithm.PATH)
        r.path_frame_batch = batch
        r.step(warm if warm is not None else max(3, batch))
        sync(r.state.accum)
        t0 = time.perf_counter()
        r.step(n)
        sync(r.state.accum)
        spf = (time.perf_counter() - t0) / n
        print(f"  {label:58s} {spf*1e3:8.1f} ms/frame "
              f"({W*H/spf/1e6:5.2f} Mrays/s)", flush=True)
        del r
        return spf * 1e3

    print("1920x1080:", flush=True)
    frames("sort on, key=auto(span at this size)")
    frames("sort on, key=cells (round-3 behavior)", path_sort_key="cells")
    frames("sort off", path_sort_chunks=False)
    frames("sort auto + frame_batch=4", batch=4, n=8)
    frames("sort off + frame_batch=4", batch=4, n=8,
           path_sort_chunks=False)
    frames("sort auto + batch=4 + chunk=8192", batch=4, n=8,
           path_chunk=8192)
    p0 = base.replace(scattering_probability=0.0)
    frames("p=0 attribution (cond-guarded segments)", params=p0)

    print("256x256 (guard the small-image operating point):", flush=True)
    frames("sort on, key=auto(cells at this size)", W=256, H=256, n=8)
    frames("sort on, key=span", W=256, H=256, n=8, path_sort_key="span")
    frames("sort off", W=256, H=256, n=8, path_sort_chunks=False)


if __name__ == "__main__":
    main()
