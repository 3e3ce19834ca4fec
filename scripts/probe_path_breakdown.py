"""PATH 1080p frame-cost breakdown (round 4 follow-up to
scripts/probe_path_1080p.py).

The p=0 attribution frame costs ~468 ms with the camera term BAKED —
so the money is in the per-frame machinery, not the camera march.  This
probe splits it further by ablating segment count, the cost-sorted
compaction, and the first-scatter RNG replay:

  1. p=0, max_path_segments=1      -> seg1 (RNG replay + prefix pick)
                                      + accumulate only;
  2. p=0, segments=8, sort on      -> + 7x (cost key + argsort) —
                                      sorting runs full-width even when
                                      the alive count is ZERO;
  3. p=0, segments=8, sort off     -> + 7x cumsum compaction only;
  4. p=default, the same grid      -> real frames, same ablations.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_path_breakdown.py
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

    def frames(label, params=base, n=4, warm=3, **cfg):
        r = Renderer(grid, StaticConfig(width=W, height=H, **cfg), params,
                     algorithm=Algorithm.PATH)
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

    p0 = base.replace(scattering_probability=0.0)
    s1 = frames("p=0, segments=1 (seg1+accumulate only)", params=p0,
                max_path_segments=1)
    s8 = frames("p=0, segments=8, sort on (the attribution row)", params=p0)
    s8n = frames("p=0, segments=8, sort off", params=p0,
                 path_sort_chunks=False)
    print(f"    -> per-segment overhead at alive=0: sort on "
          f"{(s8 - s1) / 7:.1f} ms, sort off {(s8n - s1) / 7:.1f} ms",
          flush=True)
    d8 = frames("default p, segments=8, sort on (the bench row)")
    d8n = frames("default p, segments=8, sort off", path_sort_chunks=False)
    d4 = frames("default p, segments=4, sort on", max_path_segments=4)
    d1 = frames("default p, segments=1", max_path_segments=1)
    print(f"\n  summary: seg1 {s1:.0f} | fixed/segment (sort on) "
          f"{(s8 - s1) / 7:.1f} | walk total {d8 - s8:.0f} "
          f"(segments 2-8) | seg1 share of default {100 * s1 / d8:.0f}%",
          flush=True)


if __name__ == "__main__":
    main()
