"""Headline benchmark: Mrays/sec/chip on the BASELINE.json north-star config.

Workload: Point (Instant-Radiosity VPL) progressive rendering of a
procedural cloud at 1080p with the reference's default scene parameters
(src/main.cpp:546-559) — per-frame photon-walk light generation + per-pixel
transmittance march + many-light gather + accumulation, i.e. the full
drawFrame pipeline (src/main.cpp:620-934), not a kernel microbench.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 50 (BASELINE.md target: >= 50 Mrays/sec/chip @1080p).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    import numpy as np

    from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
    from volumerenderer_tpu.grid import procedural

    width, height = 1920, 1080
    grid = procedural.cloud(n=96)
    # Default scene parameters (src/main.cpp:546-559) with the light placed
    # inside the cloud body so the photon walk produces a realistic virtual-
    # light population every frame.
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    config = StaticConfig(width=width, height=height, gather_samples=48)
    r = Renderer(grid, config, params, algorithm=Algorithm.POINT)

    # Warmup: builds the view cache and compiles the 1- and 8-frame steps.
    r.step(9)
    np.asarray(r.state.accum)

    frames = 32
    t0 = time.perf_counter()
    r.step(frames)
    np.asarray(r.state.accum)  # materialize: forces full execution
    dt = time.perf_counter() - t0

    mrays = width * height * frames / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "point_vpl_1080p_mrays_per_sec_per_chip",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
