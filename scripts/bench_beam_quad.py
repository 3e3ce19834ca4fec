"""Beam/VBL analytic-mode quadrature rules at 1080p on the current backend:
midpoint-16 (the round-2 rule) vs tangent-Gauss (round-3), exact and paired
node evaluation.  Steady-state frames on the 96^3 procedural cloud with the
reference default scene (the bench_matrix Beam rows' config)."""

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

from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
from volumerenderer_tpu.grid import procedural

W, H = 1920, 1080


def bench(rule, nodes, eval_, frames=8, algorithm=None):
    grid = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    config = StaticConfig(
        width=W, height=H, segment_mode="analytic", segment_eval=eval_,
        beam_quadrature_rule=rule, beam_quadrature_nodes=nodes,
    )
    algorithm = algorithm or Algorithm.BEAM
    r = Renderer(grid, config, params, algorithm=algorithm)
    r.step(9)
    checksum = float(jnp.sum(r.state.accum))
    t0 = time.perf_counter()
    r.step(frames)
    checksum = float(jnp.sum(r.state.accum))
    dt = time.perf_counter() - t0
    mrays = W * H * frames / dt / 1e6
    print(
        f"{algorithm.name:5s} analytic {rule:9s} n={nodes:3d} {eval_:7s}"
        f" {dt / frames * 1e3:8.1f} ms/frame {mrays:8.2f} Mrays/s"
        f"  checksum={checksum:.1f}",
        flush=True,
    )
    return mrays


if __name__ == "__main__":
    print("claiming device...", flush=True)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s "
          f"backend={jax.default_backend()}", flush=True)
    bench("midpoint", 0, "exact", algorithm=Algorithm.RAY)  # closed form
    for rule, nodes, eval_ in (
        ("midpoint", 16, "exact"),
        ("midpoint", 16, "paired"),
        ("tangent", 8, "exact"),
        ("tangent", 8, "paired"),
        ("tangent", 4, "paired"),
        ("closed", 2, "exact"),
        ("closed", 2, "paired"),
    ):
        bench(rule, nodes, eval_)
