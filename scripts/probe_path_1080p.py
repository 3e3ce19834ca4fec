"""PATH at the bar's own scale (96^3 volume, 1920x1080): reproduce the
asset-scale attribution at the default scene and re-sweep the retired
levers at the post-round-3 cost structure (VERDICT r3 next-step #4).

Measurements:
  1. cached PATH frame, batch 1 (the bench row);
  2. frame-batch re-sweep (4, 8) — retired at 256^2 in round 3, retried
     at the 1080p operating point;
  3. path_chunk width re-sweep (2048 / 4096 / 8192);
  4. path_march_cell auto vs 1 (cell skipping on/off);
  5. attribution: scattering_probability=0 frames price everything but
     the scatter-segment walk + light terms (the camera segment is baked
     in the PathView; a zero-scatter walk exits immediately), so
     walk share = default frame - zero-scatter frame.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_path_1080p.py
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

    def frames(label, params=base, batch=1, n=4, warm=3, **cfg):
        r = Renderer(grid, StaticConfig(width=W, height=H, **cfg), params,
                     algorithm=Algorithm.PATH)
        r.path_frame_batch = batch
        r.step(warm)
        sync(r.state.accum)
        t0 = time.perf_counter()
        r.step(n)
        sync(r.state.accum)
        spf = (time.perf_counter() - t0) / n
        print(f"  {label:56s} {spf*1e3:8.1f} ms/frame "
              f"({W*H/spf/1e6:5.2f} Mrays/s)", flush=True)
        del r
        return spf * 1e3

    full = frames("default (batch 1, auto cell)")
    frames("frame_batch=4", batch=4, warm=4)
    frames("frame_batch=8", batch=8, warm=8)
    frames("path_chunk=2048", path_chunk=2048)
    frames("path_chunk=8192", path_chunk=8192)
    frames("path_march_cell=1 (cell skipping off)", path_march_cell=1)
    zero = frames("scattering_probability=0 (no walk segments)",
                  params=base.replace(scattering_probability=0.0))
    print(f"\n  attribution: walk+light share {full-zero:.1f} ms of "
          f"{full:.1f} ({100*(full-zero)/full:.0f}%); fixed "
          f"(baked camera term + accumulate + dispatch) {zero:.1f} ms",
          flush=True)




def combo() -> None:
    """Follow-up: combine the levers that WON individually at 1080p
    (frame_batch=4, cell skipping off, wider chunks) — round-3 retired
    them at 256^2; the 1080p cost structure inverts them."""
    print("claiming device...", flush=True)
    _ = float(jnp.zeros((), jnp.float32))
    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.grid import procedural

    grid = procedural.cloud(n=96)
    base = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    def frames(label, batch=1, n=4, warm=None, **cfg):
        r = Renderer(grid, StaticConfig(width=W, height=H, **cfg), base,
                     algorithm=Algorithm.PATH)
        r.path_frame_batch = batch
        r.step(warm if warm is not None else max(3, batch))
        sync(r.state.accum)
        t0 = time.perf_counter()
        r.step(n)
        sync(r.state.accum)
        spf = (time.perf_counter() - t0) / n
        print(f"  {label:56s} {spf*1e3:8.1f} ms/frame "
              f"({W*H/spf/1e6:5.2f} Mrays/s)", flush=True)
        del r
        return spf * 1e3

    frames("batch=4 + cell=1", batch=4, n=8, path_march_cell=1)
    frames("batch=4 + cell=1 + chunk=8192", batch=4, n=8,
           path_march_cell=1, path_chunk=8192)
    frames("batch=4 + chunk=8192 (cell auto)", batch=4, n=8,
           path_chunk=8192)
    frames("cell=1 + chunk=8192 (batch 1)", path_march_cell=1,
           path_chunk=8192)
    frames("batch=2 + cell=1 + chunk=8192", batch=2, n=8,
           path_march_cell=1, path_chunk=8192)


if __name__ == "__main__":
    combo() if "--combo" in sys.argv else main()
