"""Break down the ~16.5 ms/frame FIXED cost of a cached 1080p gather frame
(probe_beam_roofline's zero-segment measurement): everything a steady-state
frame pays besides the light gather — photon walk, per-frame compact
accumulate, batch-end image expansion, dispatch overhead.

Method: time, separately and at two frame_batch settings,
  (a) the vmapped photon-walk batch alone (the only volume-touching stage),
  (b) zero-segment frames (walk + zero-trip slab loop + compact accumulate
      + batch-end expansion),
  (c) POINT paired frames (adds the cheapest real gather),
so each stage's share falls out of differences.  Run:
PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_fixed_cost.py
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


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    print("claiming device...", flush=True)
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed, backend={jax.default_backend()}", flush=True)

    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.grid import procedural
    from volumerenderer_tpu.render import photon

    grid = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    # (a) the walk batch alone (what render_steps_cached runs first).
    config = StaticConfig(width=W, height=H, gather_eval="paired")
    from volumerenderer_tpu.render.color import required_march_steps

    steps = required_march_steps(grid, 1.0, config.max_march_steps)
    walk_batch = jax.jit(lambda fcs: jax.vmap(
        lambda fc: photon.generate_lights(
            grid, params, fc, config, max_steps=steps)
    )(fcs))
    fcs = jnp.arange(1, 9, dtype=jnp.int32)
    out = walk_batch(fcs)
    sync(out.intensity)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        out = walk_batch(fcs)
        sync(out.intensity)
    walk_ms = (time.perf_counter() - t0) / reps / 8 * 1e3
    print(f"  photon-walk batch alone: {walk_ms:6.2f} ms/frame "
          f"(8-frame vmapped batch)", flush=True)

    # (b, c) frames at batch 8 and 1, zero lights and POINT paired.
    def frames(label, max_lights, batch, algo=Algorithm.POINT, **cfg):
        p = params
        if max_lights is not None:
            p = p.replace(max_lights=max_lights)
        r = Renderer(grid, StaticConfig(width=W, height=H, **cfg), p,
                     algorithm=algo)
        r.frame_batch = batch
        r.step(8)
        sync(r.state.accum)
        t0 = time.perf_counter()
        r.step(16)
        sync(r.state.accum)
        spf = (time.perf_counter() - t0) / 16
        print(f"  {label:52s} {spf*1e3:6.2f} ms/frame", flush=True)
        del r
        return spf * 1e3

    z8 = frames("zero lights, frame_batch=8", 0, 8, gather_eval="paired")
    z1 = frames("zero lights, frame_batch=1", 0, 1, gather_eval="paired")
    p8 = frames("POINT paired, frame_batch=8", None, 8,
                gather_eval="paired")
    p1 = frames("POINT paired, frame_batch=1", None, 1,
                gather_eval="paired")
    print(f"\n  walk {walk_ms:.2f} | zero-light residue after walk "
          f"{z8 - walk_ms:.2f} (batch-8) / {z1 - walk_ms:.2f} (batch-1)")
    print(f"  POINT gather itself: {p8 - z8:.2f} ms (batch-8)")
    print(f"  batch-amortized dispatch/expansion: {z1 - z8:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
