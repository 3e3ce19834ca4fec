"""Round-5 walk sweep #2 at 1080p: sort-vs-inherited order, sub-block,
frame batch — on top of the contiguous-forwarding walk.

The forwarding restructure (render.path._scatter_segments) keeps the
alive rays in the FIRST count rows of the compact buffer across
segments, in the PREVIOUS segment's cost order, so the per-segment
argsort (~5.3 ms full-width x 6 segments, plus span-key arithmetic) may
no longer buy its keep vs plain order-preserving compaction
(path_sort_chunks=False).  Sub-block and frame-batch interact with the
path_stride fast tier (stride shrinks per-block fetch work, so the
while_loop trip count and fixed costs weigh more).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_walk2_1080p.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

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

    from volumerenderer_tpu import (Algorithm, Renderer, RenderParams,
                                    StaticConfig)
    from volumerenderer_tpu.grid import procedural

    g = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    frames = 8
    base_cfg = StaticConfig(width=1920, height=1080)
    rows = []

    def run(label, cfg, fb=1):
        r = Renderer(g, cfg, params, algorithm=Algorithm.PATH)
        r.path_frame_batch = fb
        r.step(2 * fb)
        sync(r.state.accum)
        n = max(frames, 2 * fb)
        t1 = time.perf_counter()
        r.step(n)
        checksum = sync(r.state.accum)
        dt = (time.perf_counter() - t1) / n * 1e3
        mrays = 1920 * 1080 / (dt / 1e3) / 1e6
        rows.append((label, dt, mrays, checksum))
        print(f"  {label:44s} {dt:7.1f} ms/frame ({mrays:5.2f} Mrays/s) "
              f"checksum={checksum:.6g}", flush=True)
        del r

    for stride in (1, 3):
        for sort in (True, False):
            cfg = dataclasses.replace(base_cfg, path_stride=stride,
                                      path_sort_chunks=sort)
            run(f"stride={stride} sort={sort}", cfg)
    for sb in (64, 128):
        cfg = dataclasses.replace(base_cfg, path_stride=3, path_subblock=sb)
        run(f"stride=3 subblock={sb}", cfg)
    for fb in (2, 4):
        cfg = dataclasses.replace(base_cfg, path_stride=3)
        run(f"stride=3 frame_batch={fb}", cfg, fb=fb)
    for stride in (2, 4, 6):
        cfg = dataclasses.replace(base_cfg, path_stride=stride)
        run(f"stride={stride}", cfg)

    best = min(rows, key=lambda r: r[1])
    print(f"\nbest: {best[0]} {best[1]:.1f} ms ({best[2]:.2f} Mrays/s)",
          flush=True)


if __name__ == "__main__":
    main()
