"""Measure the interactive-motion timeline at 1080p (VERDICT r2 #3):
per-frame cost while dragging the camera (motion_mode="coarse" by
default — full-depth strided march, brightness-preserving; pass
--mode truncated for the short-prefix variant), the settle frame (first
key-stable frame -> exact device rebuild), and the frames after it
(cached steady state).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_motion.py
         [--mode coarse|truncated] [--stride 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="coarse",
                    choices=["coarse", "truncated"])
    ap.add_argument("--stride", type=int, default=12)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    t0 = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"terminal claimed in {time.perf_counter() - t0:.0f}s", flush=True)

    from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
    from volumerenderer_tpu.grid import procedural

    W, H = 1920, 1080
    g = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=np.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=np.float32([0.0, 20.0, 20.0]),
    )
    r = Renderer(
        g,
        StaticConfig(width=W, height=H, motion_mode=args.mode,
                     motion_stride=args.stride),
        params, algorithm=Algorithm.POINT)
    print(f"motion_mode={args.mode} stride={args.stride}", flush=True)

    # Warm every program: steady state, one drag frame, one settle rebuild.
    r.step(4); sync(r.state.accum)
    r.set(camera_pos=np.float32([0.0, 20.0, -75.5])); r.step(1)
    sync(r.state.accum)          # drag frame compiled
    r.step(1); sync(r.state.accum)  # settle (exact rebuild) compiled
    r.step(8); sync(r.state.accum)  # cached BATCHED-8 program compiled
    # (the timed cached region below steps 8 frames -> frame_batch path)
    print("warm; measuring timeline...", flush=True)

    # Drag: 6 frames, new camera each frame.
    tg0 = time.perf_counter()
    n_drag = 6
    for i in range(n_drag):
        r.set(camera_pos=np.float32([0.0, 20.0, -76.0 - 0.25 * i]))
        r.step(1)
    sync(r.state.accum)
    drag_ms = (time.perf_counter() - tg0) / n_drag * 1e3
    print(f"drag frame        {drag_ms:8.1f} ms  "
          f"{W * H / drag_ms / 1e3:6.1f} Mrays/s", flush=True)

    # Settle: camera stops; the next step is key-stable -> exact rebuild.
    ts0 = time.perf_counter()
    r.step(1)
    sync(r.state.accum)
    settle_ms = (time.perf_counter() - ts0) * 1e3
    print(f"settle frame      {settle_ms:8.1f} ms  (exact rebuild + shade)"
          f"  view_exact={r.view_exact}", flush=True)

    # Cached steady state after settling.
    tc0 = time.perf_counter()
    r.step(8)
    sync(r.state.accum)
    cached_ms = (time.perf_counter() - tc0) / 8 * 1e3
    print(f"cached frame      {cached_ms:8.1f} ms  "
          f"{W * H / cached_ms / 1e3:6.1f} Mrays/s", flush=True)
    print(f"time to cached rate after drag stop: "
          f"{(settle_ms) / 1e3:.2f} s", flush=True)


if __name__ == "__main__":
    main()
