"""Error-tail analysis for gather_stride: percentiles, deviant-pixel
counts, and SSIM on the 8-frame ACCUMULATED image (the user-visible
quantity) at 960x540, per gather algorithm, stride 2 and 3.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_stride_error.py
"""

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


def ssim(a, b):
    """Global SSIM (single window) — adequate for a scalar summary."""
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
            / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))


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
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    def accum8(algo, **cfg):
        r = Renderer(grid, StaticConfig(width=960, height=540, **cfg),
                     params, algorithm=algo)
        r.step(8)
        out = np.asarray(r.state.accum)
        del r
        return out

    cases = [
        ("Point paired", Algorithm.POINT, dict(gather_eval="paired")),
        ("Sphere paired", Algorithm.SPHERE, dict(gather_eval="paired")),
        ("Ray analytic paired", Algorithm.RAY,
         dict(segment_mode="analytic", segment_eval="paired")),
        ("Beam closed paired", Algorithm.BEAM,
         dict(segment_mode="analytic", segment_eval="paired",
              beam_quadrature_rule="closed")),
    ]
    n_px = 960 * 540
    for label, algo, cfg in cases:
        ex = accum8(algo, **cfg)
        scale = max(float(np.abs(ex).max()), 1e-9)
        for s, fold in ((2, "centroid"), (3, "centroid"),
                        (2, "gauss2"), (3, "gauss2")):
            de = accum8(algo, gather_stride=s, gather_fold=fold, **cfg)
            rel = np.abs(de - ex) / scale
            p = np.percentile(rel, [99, 99.9, 100])
            n5 = int((rel > 0.05).sum())
            n1 = int((rel > 0.01).sum())
            print(f"  {label:22s} stride {s} {fold:8s}: p99={p[0]:.2e} "
                  f"p99.9={p[1]:.2e} max={p[2]:.2e}  "
                  f">1%: {n1} px ({n1/n_px*100:.3f}%)  >5%: {n5} px "
                  f"({n5/n_px*100:.4f}%)  SSIM={ssim(de, ex):.5f}",
                  flush=True)


if __name__ == "__main__":
    main()
