"""Microbenchmark: exact vs paired Point/Sphere light-loop arithmetic.

The Point/VPL headline kernel spends one guarded f32 divide per
(sample, light) pair (ops/pallas/gather_lanes._point_kernel); the paired
evaluation amortizes it to one divide per 4 lights — the same lever that
made Ray discrete 1.6x (PARITY.md #15).  This measures both at the
headline config (1080p, 96^3 procedural cloud, reference defaults).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/microbench_paired_gather.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp

T0 = time.perf_counter()


def note(msg: str) -> None:
    print(f"[paired {time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    note("claiming TPU terminal...")
    _ = float(jnp.zeros((), jnp.float32))
    note("claimed")

    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.grid import procedural

    width, height = 1920, 1080
    grid = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=np.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=np.float32([0.0, 20.0, 20.0]),
    )

    results = {}
    for algo, res in ((Algorithm.POINT, (1920, 1080)),
                      (Algorithm.SPHERE, (1280, 720))):
        for mode in ("exact", "paired"):
            config = StaticConfig(width=res[0], height=res[1],
                                  gather_eval=mode)
            r = Renderer(grid, config, params, algorithm=algo)
            r.step(8)
            sync(r.state.accum)
            frames = 32
            t0 = time.perf_counter()
            r.step(frames)
            checksum = sync(r.state.accum)
            dt = time.perf_counter() - t0
            mrays = res[0] * res[1] * frames / dt / 1e6
            key = f"{algo.name.lower()}_{res[1]}p_{mode}"
            results[key] = (dt / frames * 1e3, mrays, checksum)
            note(f"{key}: {dt / frames * 1e3:.1f} ms/frame "
                 f"{mrays:.1f} Mrays/s checksum={checksum:.1f}")

    for k, (ms, mr, cs) in results.items():
        print(f"{k}: {ms:.2f} ms/frame  {mr:.2f} Mrays/s  checksum={cs:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
