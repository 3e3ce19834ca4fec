"""Decompose PATH's scatter-walk cost at 1080p: per-chunk fixed cost vs
per-segment fixed cost vs per-fetch work (round-5 follow-up to
probe_path_replay.py — the stride tier only bought 650 -> 442 ms at
stride 6, so the walk is NOT sample-bound; the suspects are the ~830
chunk dispatches per frame at path_chunk=2048 and the 7 per-segment
full-width compactions).

Sweeps: path_chunk width, path_subblock, sort on/off, max_path_segments
(diagnostic only — semantics truncate), and the winning combos with
path_stride=3 (the --fast tier).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_path_walkcost.py
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

W, H = 1920, 1080


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

    def frames(label, params=base, n=4, warm=2, **cfg):
        r = Renderer(grid, StaticConfig(width=W, height=H, **cfg), base
                     if params is None else params, algorithm=Algorithm.PATH)
        r.step(warm)
        _ = float(jnp.sum(r.state.accum))
        t0 = time.perf_counter()
        r.step(n)
        _ = float(jnp.sum(r.state.accum))
        spf = (time.perf_counter() - t0) / n
        print(f"  {label:56s} {spf*1e3:8.1f} ms/frame "
              f"({W*H/spf/1e6:5.2f} Mrays/s)", flush=True)
        del r
        return spf * 1e3

    frames("default (chunk 2048, sort, subblock 32)")
    frames("path_chunk=8192", path_chunk=8192)
    frames("path_chunk=16384", path_chunk=16384)
    frames("path_chunk=32768", path_chunk=32768)
    frames("path_chunk=65536", path_chunk=65536)
    frames("path_sort_chunks=False", path_sort_chunks=False)
    frames("path_sort_chunks=False + chunk 16384",
           path_sort_chunks=False, path_chunk=16384)
    frames("path_subblock=64", path_subblock=64)
    frames("path_subblock=64 + chunk 16384",
           path_subblock=64, path_chunk=16384)
    frames("max_path_segments=4 (diagnostic truncation)",
           max_path_segments=4)
    frames("max_path_segments=2 (diagnostic truncation)",
           max_path_segments=2)
    frames("stride 3 (tier)", path_stride=3)
    frames("stride 3 + chunk 16384", path_stride=3, path_chunk=16384)
    frames("stride 3 + chunk 65536", path_stride=3, path_chunk=65536)
    frames("stride 3 + chunk 16384 + nosort", path_stride=3,
           path_chunk=16384, path_sort_chunks=False)


if __name__ == "__main__":
    main()
