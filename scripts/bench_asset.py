"""Production-asset timings (the 44M-voxel deep-z bunny-cloud stand-in,
392x360x312, nz=312 -> z-sub-row 104): POINT steady state + exact view
rebuild + PATH cached frames at 512^2.  The deep-volume fetch numbers in
BENCHMARKS.md's production-asset paragraph come from here."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.join(os.path.dirname(__file__), os.pardir)
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main() -> None:
    print("claiming device...", flush=True)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s", flush=True)

    from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
    from volumerenderer_tpu.grid.dense import from_dense

    dense = np.load(os.path.join(REPO, ".cache", "asset_vol.npy"))
    g = from_dense(dense, bbox_min=(-196, -180, -156), voxel_size=0.125,
                   translation=(0.0, 20.0, 20.0))
    print(f"volume {dense.shape}", flush=True)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -40.0]),
        light_source_world_pos=jnp.float32([-10.0, 28.0, 8.0]),
    )
    W = H = 512
    config = StaticConfig(width=W, height=H)

    # POINT: build + steady state
    t0 = time.perf_counter()
    r = Renderer(g, config, params, algorithm=Algorithm.POINT)
    r.step(1)
    _ = float(jnp.sum(r.state.accum))
    print(f"POINT first frame (compile+build): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    r.step(8)
    _ = float(jnp.sum(r.state.accum))
    t0 = time.perf_counter()
    r.step(32)
    _ = float(jnp.sum(r.state.accum))
    dt = (time.perf_counter() - t0) / 32
    print(f"POINT steady: {dt * 1e3:.1f} ms/frame "
          f"({W * H / dt / 1e6:.1f} Mrays/s)", flush=True)
    # exact rebuild on a camera nudge (warm both parameter points first)
    for fov in (44.9, 45.0):
        r.set(fov=fov)
        r.step(1)
    _ = float(jnp.sum(r.state.accum))
    t0 = time.perf_counter()
    for i in range(4):
        r.set(fov=44.9 if i % 2 == 0 else 45.0)
        r.step(1)
    _ = float(jnp.sum(r.state.accum))
    print(f"POINT moving camera (exact rebuild): "
          f"{(time.perf_counter() - t0) / 4 * 1e3:.0f} ms/frame", flush=True)
    del r

    # Interactive motion mode at asset scale: coarse drag frames render
    # through the uncached strided step — also exercises the deep-z
    # (nz=312) z-row tile budget on the plain build_view path.
    import dataclasses

    rm = Renderer(g, dataclasses.replace(config, motion_mode="coarse"),
                  params, algorithm=Algorithm.POINT)
    rm.step(1)
    rm.set(fov=44.9); rm.step(1)
    _ = float(jnp.sum(rm.state.accum))  # drag program compiled
    t0 = time.perf_counter()
    for i in range(4):
        rm.set(fov=44.8 - 0.05 * i)
        rm.step(1)
    _ = float(jnp.sum(rm.state.accum))
    dt = (time.perf_counter() - t0) / 4
    print(f"POINT moving camera (motion_mode=coarse): "
          f"{dt * 1e3:.0f} ms/frame ({W * H / dt / 1e6:.1f} Mrays/s), "
          f"image mean {float(np.asarray(rm.image()).mean()):.4f}",
          flush=True)
    del rm

    # PATH: cached camera segment, steady frames
    rp = Renderer(g, config, params, algorithm=Algorithm.PATH)
    t0 = time.perf_counter()
    rp.step(1)
    _ = float(jnp.sum(rp.state.accum))
    print(f"PATH first frame (compile+bake): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    rp.step(2)
    _ = float(jnp.sum(rp.state.accum))
    t0 = time.perf_counter()
    rp.step(8)
    _ = float(jnp.sum(rp.state.accum))
    dt = (time.perf_counter() - t0) / 8
    print(f"PATH cached: {dt * 1e3:.0f} ms/frame "
          f"({W * H / dt / 1e6:.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
