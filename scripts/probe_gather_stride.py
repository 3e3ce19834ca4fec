"""Quantify StaticConfig.gather_stride (centroid-folded gather samples):
per-algorithm 1080p throughput and image error vs the exact evaluation at
the bench scene.  Error metric: max |dec - exact| / max(exact) and mean
relative deviation over lit pixels, single frame (frame 1, fixed photons).
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_gather_stride.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

W, H = 1920, 1080
FRAMES = 8


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    print("claiming device...", flush=True)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s "
          f"backend={jax.default_backend()}", flush=True)

    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.grid import procedural

    grid = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    def frame1(algo, w, h, **cfg):
        r = Renderer(grid, StaticConfig(width=w, height=h, **cfg), params,
                     algorithm=algo)
        r.step(1)
        img = np.asarray(r.state.accum)
        del r
        return img

    def perf(label, algo, **cfg):
        r = Renderer(grid, StaticConfig(width=W, height=H, **cfg), params,
                     algorithm=algo)
        r.step(9)
        sync(r.state.accum)
        t0 = time.perf_counter()
        r.step(FRAMES)
        sync(r.state.accum)
        spf = (time.perf_counter() - t0) / FRAMES
        print(f"  {label:58s} {spf*1e3:7.1f} ms ({W*H/spf/1e6:6.2f} "
              f"Mrays/s)", flush=True)
        del r
        return spf

    cases = [
        ("Point paired", Algorithm.POINT, dict(gather_eval="paired")),
        ("Sphere paired", Algorithm.SPHERE, dict(gather_eval="paired")),
        ("Ray analytic paired", Algorithm.RAY,
         dict(segment_mode="analytic", segment_eval="paired")),
        ("Beam closed paired", Algorithm.BEAM,
         dict(segment_mode="analytic", segment_eval="paired",
              beam_quadrature_rule="closed")),
    ]

    # ---- accuracy at 960x540 (same scene geometry, affordable readback)
    print("accuracy (960x540, frame 1, vs exact gather):", flush=True)
    for label, algo, cfg in cases:
        ex = frame1(algo, 960, 540, **cfg)
        scale = max(float(np.abs(ex).max()), 1e-9)
        lit = np.abs(ex) > 1e-3 * scale
        for s in (2, 3, 4):
            de = frame1(algo, 960, 540, gather_stride=s, **cfg)
            maxrel = float(np.abs(de - ex).max() / scale)
            meanrel = float(
                (np.abs(de - ex)[lit] / np.maximum(np.abs(ex)[lit],
                                                   1e-9)).mean()
            )
            print(f"  {label:24s} stride {s}: max|d|/max = {maxrel:.2e}, "
                  f"mean rel (lit) = {meanrel:.2e}", flush=True)

    # ---- 1080p throughput
    print("throughput (1920x1080):", flush=True)
    for label, algo, cfg in cases:
        perf(f"{label} exact samples", algo, **cfg)
        for s in (2, 3):
            perf(f"{label} gather_stride={s}", algo, gather_stride=s, **cfg)


if __name__ == "__main__":
    main()
