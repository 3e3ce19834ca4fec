"""Measure the cross-segment divide pairing (segment_eval="paired" on the
closed-rule VBL and closed-form VRL): Beam/Ray analytic frame times at the
1080p bench config, exact vs paired.  Run on the real chip:
PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_seg_paired.py
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

    def measure(label, algo, **cfg):
        r = Renderer(
            grid, StaticConfig(width=W, height=H, **cfg), params,
            algorithm=algo,
        )
        r.step(9)
        sync(r.state.accum)
        t0 = time.perf_counter()
        r.step(FRAMES)
        cs = sync(r.state.accum)
        spf = (time.perf_counter() - t0) / FRAMES
        print(f"  {label:52s} {spf*1e3:7.1f} ms/frame "
              f"({W*H/spf/1e6:6.2f} Mrays/s)  checksum={cs:.1f}",
              flush=True)
        del r
        return spf

    measure("Beam closed exact", Algorithm.BEAM,
            segment_mode="analytic", beam_quadrature_rule="closed")
    measure("Beam closed paired (cross-segment)", Algorithm.BEAM,
            segment_mode="analytic", beam_quadrature_rule="closed",
            segment_eval="paired")
    measure("Ray analytic exact", Algorithm.RAY,
            segment_mode="analytic")
    measure("Ray analytic paired (cross-segment)", Algorithm.RAY,
            segment_mode="analytic", segment_eval="paired")


if __name__ == "__main__":
    main()
