"""Sweep PATH scatter-walk tile knobs (path_chunk x path_subblock) at the
256^2 benchmark config on the real chip.

The walk's early exits trade against op width: wider chunks mean fewer
while-loop iterations but the sub-block early exit waits for EVERY ray in
the chunk to resolve (frame-batching lost for exactly this reason,
BENCHMARKS.md).  This measures where the knee is instead of guessing.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_path.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import time

import jax
import jax.numpy as jnp


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    t0 = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"terminal claimed in {time.perf_counter() - t0:.0f}s", flush=True)

    from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
    from volumerenderer_tpu.grid import procedural

    g = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    frames = 16
    base = None
    for chunk in (1024, 2048, 4096, 8192):
        for sb in (16, 32, 64):
            r = Renderer(
                g,
                StaticConfig(width=256, height=256, path_chunk=chunk,
                             path_subblock=sb),
                params, algorithm=Algorithm.PATH,
            )
            r.step(5)
            sync(r.state.accum)
            t0 = time.perf_counter()
            r.step(frames)
            s = sync(r.state.accum)
            spf = (time.perf_counter() - t0) / frames
            if base is None and chunk == 2048 and sb == 32:
                base = spf
            print(f"chunk={chunk:5d} sb={sb:3d}  {spf * 1e3:7.1f} ms/frame"
                  f"  {256 * 256 / spf / 1e6:5.2f} Mrays/s"
                  f"  (checksum {s:.2f})", flush=True)
            del r


if __name__ == "__main__":
    main()
