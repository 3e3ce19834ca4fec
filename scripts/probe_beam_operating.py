"""Beam/VBL 1080p operating-point search (VERDICT r4 next #2): find a
committed row with >= 50 Mrays/s AND SSIM >= 0.99 vs the exact
accumulated image.

The stride-2 centroid tier passes the bar (56.3 Mrays/s) but fails the
quality line (SSIM 0.9896); probe_stride_error.py at 960x540 showed
stride-2 gauss2 = 0.99027 and stride-3 centroid = 0.99322 — both over
the line.  This probe measures BOTH halves at the bar's own resolution
(1920x1080, 8 accumulated frames, closed-form paired Beam) for each
(stride, fold) candidate, so the winning row is directly committable.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_beam_operating.py
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

W, H = 1920, 1080


def ssim(a, b):
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
    from volumerenderer_tpu.utils.ssim import ssim as wssim

    grid = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    def run(stride, fold):
        r = Renderer(
            grid,
            StaticConfig(
                width=W, height=H, segment_mode="analytic",
                segment_eval="paired", beam_quadrature_rule="closed",
                gather_stride=stride, gather_fold=fold,
            ),
            params, algorithm=Algorithm.BEAM,
        )
        # quality: the 8-frame accumulated image
        r.step(8)
        img = np.asarray(r.state.accum)
        # throughput: steady state after the warmup
        t0 = time.perf_counter()
        r.step(8)
        _ = float(jnp.sum(r.state.accum))
        spf = (time.perf_counter() - t0) / 8
        del r
        return img, spf

    exact, spf0 = run(1, "centroid")
    print(f"  exact (stride 1):      {spf0*1e3:7.1f} ms/frame "
          f"({W*H/spf0/1e6:5.1f} Mrays/s)", flush=True)

    for stride, fold in ((2, "centroid"), (2, "gauss2"),
                         (3, "centroid"), (3, "gauss2"),
                         (4, "centroid"), (4, "gauss2")):
        img, spf = run(stride, fold)
        s = ssim(img, exact)
        sw = wssim(img, exact)  # the BASELINE.md acceptance metric
        rel = np.abs(img - exact) / max(float(np.abs(exact).max()), 1e-9)
        p99 = np.percentile(rel, 99)
        mark = (" <== BAR"
                if (W * H / spf / 1e6 >= 50 and s >= 0.99 and sw >= 0.99)
                else "")
        print(f"  stride {stride} {fold:8s}: {spf*1e3:7.1f} ms/frame "
              f"({W*H/spf/1e6:5.1f} Mrays/s)  SSIM={s:.5f} "
              f"wSSIM={sw:.5f} p99={p99:.2e}{mark}", flush=True)


if __name__ == "__main__":
    main()
