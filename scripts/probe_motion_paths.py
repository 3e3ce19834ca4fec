"""Probe the per-frame cost of candidate camera-motion paths at 1080p.

Compares, per drag frame (camera changes every frame, programs warm):
  - build+shade at motion_stride s (the "coarse" device build path)
  - the plain UNCACHED step at stride s (no view build / transposes)
  - the "truncated" short-cap build (brightness-broken; timing anchor)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_motion_paths.py
"""
from __future__ import annotations

import dataclasses
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
    print(f"terminal claimed in {time.perf_counter() - t0:.0f}s", flush=True)

    from volumerenderer_tpu import (Algorithm, Renderer, RenderParams,
                                    StaticConfig)
    from volumerenderer_tpu.grid import procedural

    W, H = 1920, 1080
    g = procedural.cloud(n=96)
    base_params = RenderParams.default().replace(
        camera_pos=np.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=np.float32([0.0, 20.0, 20.0]),
    )

    def drag_rate(mode, stride=8, cap=16, n_drag=6):
        r = Renderer(
            g,
            StaticConfig(width=W, height=H, motion_mode=mode,
                         motion_stride=stride, motion_cap=cap),
            base_params, algorithm=Algorithm.POINT)
        r.step(1); sync(r.state.accum)
        r.set(camera_pos=np.float32([0.0, 20.0, -75.5])); r.step(1)
        sync(r.state.accum)  # drag-frame program compiled
        t = time.perf_counter()
        for i in range(n_drag):
            r.set(camera_pos=np.float32([0.0, 20.0, -76.0 - 0.25 * i]))
            r.step(1)
        sync(r.state.accum)
        ms = (time.perf_counter() - t) / n_drag * 1e3
        mean = float(np.asarray(r.image()).mean())
        return ms, mean

    def uncached_rate(stride, n_drag=6):
        from volumerenderer_tpu.engine.step import render_step
        r = Renderer(g, StaticConfig(width=W, height=H), base_params,
                     algorithm=Algorithm.POINT)
        from volumerenderer_tpu.render.color import required_march_steps
        base = float(r.params.ray_marching_step_size)
        params = r.params.replace(
            ray_marching_step_size=np.float32(base * stride))
        max_steps = required_march_steps(
            r.grid, base * stride, r.config.max_march_steps)
        st = r.state
        st, _ = render_step(r.grid, params, st, algorithm=Algorithm.POINT,
                            config=r.config, max_steps=max_steps,
                            gather_samples=0)
        sync(st.accum)
        t = time.perf_counter()
        for i in range(n_drag):
            params = params.replace(camera_pos=jnp.float32(
                [0.0, 20.0, -76.0 - 0.25 * i]))
            st, _ = render_step(r.grid, params, st,
                                algorithm=Algorithm.POINT, config=r.config,
                                max_steps=max_steps, gather_samples=0)
        sync(st.accum)
        ms = (time.perf_counter() - t) / n_drag * 1e3
        mean = float(np.asarray(st.rgb()).mean())
        return ms, mean

    ref_ms, ref_mean = drag_rate("off")
    print(f"exact rebuild/frame  {ref_ms:8.1f} ms  "
          f"{W*H/ref_ms/1e3:6.1f} Mrays/s  mean {ref_mean:.4f}", flush=True)
    for s in (4, 8, 12, 16):
        ms, mean = drag_rate("coarse", stride=s)
        print(f"coarse stride {s:2d}     {ms:8.1f} ms  "
              f"{W*H/ms/1e3:6.1f} Mrays/s  mean {mean:.4f}", flush=True)
    for s in (8, 12):
        ms, mean = uncached_rate(s)
        print(f"uncached stride {s:2d}   {ms:8.1f} ms  "
              f"{W*H/ms/1e3:6.1f} Mrays/s  mean {mean:.4f}", flush=True)
    ms, mean = drag_rate("truncated")
    print(f"truncated cap 16     {ms:8.1f} ms  "
          f"{W*H/ms/1e3:6.1f} Mrays/s  mean {mean:.4f} (dim)", flush=True)


if __name__ == "__main__":
    main()
