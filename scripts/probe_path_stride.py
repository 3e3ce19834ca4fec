"""PATH fast-tier operating points at 1080p (VERDICT r4 next #1/#8):
throughput and quality of StaticConfig.path_stride.

Quality methodology: PATH is stochastic — any finite accumulation
carries Monte Carlo noise — so each tier's 32-frame accumulated image is
compared against the EXACT tier's 32-frame accumulation, and the
exact-vs-exact SSIM across DISJOINT frame windows (frames 1-32 vs 33-64,
independent RNG realizations of the same estimator) is printed first as
the noise floor: a tier whose SSIM reaches that floor is
indistinguishable from exact at this accumulation depth.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_path_stride.py
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
N_ACC = 32


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

    grid = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    def run(stride, batch=1, n_acc=N_ACC, time_n=8):
        r = Renderer(grid, StaticConfig(width=W, height=H,
                                        path_stride=stride),
                     params, algorithm=Algorithm.PATH)
        r.path_frame_batch = batch
        r.step(n_acc)
        img = np.asarray(r.state.accum)
        t0 = time.perf_counter()
        r.step(time_n)
        _ = float(jnp.sum(r.state.accum))
        spf = (time.perf_counter() - t0) / time_n
        del r
        return img, spf

    exact, spf0 = run(1, time_n=4)
    print(f"  exact (stride 1):    {spf0*1e3:7.1f} ms/frame "
          f"({W*H/spf0/1e6:5.2f} Mrays/s)", flush=True)

    # Noise floor: exact frames 33..64 vs 1..32 (independent realizations).
    r = Renderer(grid, StaticConfig(width=W, height=H, path_stride=1),
                 params, algorithm=Algorithm.PATH)
    r.step(N_ACC)
    a = np.asarray(r.state.accum)
    r.state = r.state.refresh()
    # Fast-forward the frame counter so the second window draws frames
    # 33..64: seeds are pixel*frameCount, so windows are independent.
    import dataclasses

    from volumerenderer_tpu.engine.state import RenderState
    r.state = RenderState(accum=r.state.accum * 0.0,
                          frame_count=jnp.asarray(N_ACC, jnp.int32))
    r.step(N_ACC)
    # accum now holds mean over frames 1..64 weighted oddly (frame_count
    # ran 33..64 with clear-on-1 never firing) — recover window mean:
    # accumulate() computes ((prev*(n-1)+f)/n) per frame n=33..64 from a
    # zero start, which equals (sum_{33..64} f)/64 * (64/32)... simpler:
    # reconstruct directly: mean_33_64 = accum_64 * 64/32 (prev=0 at 32).
    b = np.asarray(r.state.accum) * (2 * N_ACC) / N_ACC
    floor = ssim(a, b)
    print(f"  exact-vs-exact disjoint-window SSIM (noise floor at "
          f"{N_ACC} frames): {floor:.5f}", flush=True)
    del r

    for stride, batch in ((2, 1), (3, 1), (4, 1), (6, 1), (4, 4)):
        img, spf = run(stride, batch)
        s = ssim(img, exact)
        print(f"  stride {stride} batch {batch}: {spf*1e3:7.1f} ms/frame "
              f"({W*H/spf/1e6:5.2f} Mrays/s)  SSIM={s:.5f} "
              f"(floor {floor:.5f})", flush=True)


if __name__ == "__main__":
    main()
