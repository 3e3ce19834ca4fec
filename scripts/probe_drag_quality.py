"""Quantify drag-frame quality vs stride (VERDICT r4 weak #7 / PARITY
#18): SSIM + mean ratio of a coarse motion-preview frame against the
exact frame at the SAME camera, across motion_stride values, plus the
per-drag-frame cost — so the default stride is picked from data rather
than eyeballed brightness bands.

Method: settle a renderer at camera A (exact view built), move the
camera to B, refresh (accumulation reset), then one step() — the motion
classifier routes it through the coarse path, so image() IS the lone
drag frame at B.  The exact reference frame is a motion-off renderer at
B stepped once.  POINT carries the sweep (all gather algorithms share
the same coarse march; the PATH drag path is the same strided step).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_drag_quality.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    t0 = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t0:.0f}s", flush=True)

    from volumerenderer_tpu import (Algorithm, Renderer, RenderParams,
                                    StaticConfig)
    from volumerenderer_tpu.grid import procedural
    from volumerenderer_tpu.utils.ssim import ssim

    W, H = 1920, 1080
    g = procedural.cloud(n=96)
    cam_a = np.float32([0.0, 20.0, -75.0])
    cam_b = np.float32([4.0, 21.0, -73.0])  # a mid-drag nudge
    base = RenderParams.default().replace(
        camera_pos=jnp.asarray(cam_a),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    # Exact single frame at camera B (the quality target).
    r = Renderer(g, StaticConfig(width=W, height=H), base,
                 algorithm=Algorithm.POINT)
    r.set(camera_pos=cam_b)
    r.refresh()
    r.step(1)
    exact = np.asarray(r.image()).mean(axis=-1)
    del r

    print(f"{'stride':>6} {'SSIM':>8} {'mean ratio':>10} "
          f"{'ms/drag-frame':>13} {'Mrays/s':>8}")
    for stride in (2, 4, 6, 8, 12, 16, 24):
        cfg = StaticConfig(width=W, height=H, motion_mode="coarse",
                           motion_stride=stride)
        r = Renderer(g, cfg, base, algorithm=Algorithm.POINT)
        r.step(1)                      # settle at A (exact view built)
        r.set(camera_pos=cam_b)
        r.refresh()
        r.step(1)                      # the drag frame at B
        img = np.asarray(r.image()).mean(axis=-1)
        s = ssim(img, exact)
        ratio = float(img.mean() / max(exact.mean(), 1e-12))
        # Timing: keep dragging (new camera every frame, warm program).
        pos = np.asarray(cam_b).copy()
        for _ in range(2):             # warm the coarse program
            pos = pos + np.float32([0.2, 0.0, 0.1])
            r.set(camera_pos=pos)
            r.step(1)
        sync(r.state.accum)
        n = 6
        t0 = time.perf_counter()
        for _ in range(n):
            pos = pos + np.float32([0.2, 0.0, 0.1])
            r.set(camera_pos=pos)
            r.step(1)
        sync(r.state.accum)
        spf = (time.perf_counter() - t0) / n
        print(f"{stride:>6} {s:8.4f} {ratio:10.3f} {spf*1e3:13.1f} "
              f"{W*H/spf/1e6:8.1f}", flush=True)
        del r


if __name__ == "__main__":
    main()
