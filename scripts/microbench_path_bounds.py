"""PATH bound analysis: what limits the scatter-segment walk.

Round-3 evidence for why PATH sits at ~1.5 Mrays/s at 256^2 (VERDICT r2
next-#5): the walk is FETCH-RATE-bound at the z-row gather formulation's
plateau, and the whole frame runs within ~1.4x of that formulation's
speed of light.  Companion to scripts/microbench_fetch.py (which
established the 272 Mfetch/s z-row plateau and the inexpressibility of a
scattered VMEM fetch kernel in this Pallas/Mosaic version).

Measurements (TPU v5e, 2026-08-17; rerun prints fresh numbers):

  * One amortized 2048-ray `_walk_chunk` (6 blocks x 32 samples = 393k
    density fetches): 2.51 ms full, 1.96 ms with the light term patched
    to a constant -> ~200 Mfetch/s inside the walk, ~75% of the pure
    z-row plateau.  The light term (norm + shadow-probe LUT + exp) costs
    the remaining ~0.55 ms.
  * Whole-frame ablations at 256^2 (light term and/or density fetch
    patched to constants) all time ~42 ms — constant density makes every
    sample occupied, so rays scatter almost immediately but ALL stay
    alive through every segment; the fetch volume shifts between
    blocks-per-chunk and chunks-per-segment and lands in the same place.
    The invariance is trajectory compensation, not insensitivity.
  * Fetch-volume accounting: 42 ms at ~195 Mfetch/s ~= 8.2M density
    fetches/frame for 65k rays (~126 per ray across scatter segments;
    the baked camera segment fetches zero).  At the 272 Mfetch/s
    formulation plateau the same volume takes ~30 ms -> the formulation
    speed of light is ~2.2 Mrays/s; the frame achieves ~72% of it.

  * Retired alternatives (both implemented, measured, kept opt-in):
    frame-batched scatter segments (8x op sizes, 8x work, same rate —
    47-48 ms/frame vs 42.4) and occupied-cell skipping (per-ray top_k
    over the cell axis costs more than the skipped fetches; scatter rays
    start inside the cloud).  Per-gather-op dispatch is NOT the
    bottleneck (fori/while iteration overhead ~20 us, sync floor ~26 ms
    per D2H — see the loop microbench in this file's history).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/microbench_path_bounds.py
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

T0 = time.perf_counter()


def note(msg: str) -> None:
    print(f"[pbounds {time.perf_counter() - T0:6.1f}s] {msg}",
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
    from volumerenderer_tpu.grid import dense as dense_mod
    from volumerenderer_tpu.render import path as path_mod

    asset = "--asset" in sys.argv
    if asset:
        # The 44M-voxel production volume (see scripts/bench_asset.py):
        # where PATH runs ~1.25 s/frame at 512^2 — attribute that time.
        dense = np.load(os.path.join(os.path.dirname(__file__), os.pardir,
                                     ".cache", "asset_vol.npy"))
        from volumerenderer_tpu.grid.dense import from_dense

        g = from_dense(dense, bbox_min=(-196, -180, -156), voxel_size=0.125,
                       translation=(0.0, 20.0, 20.0))
        params = RenderParams.default().replace(
            camera_pos=jnp.float32([0.0, 20.0, -40.0]),
            light_source_world_pos=jnp.float32([-10.0, 28.0, 8.0]),
        )
    else:
        g = procedural.cloud(n=96)
        params = RenderParams.default().replace(
            camera_pos=jnp.float32([0.0, 20.0, -75.0]),
            light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
        )

    orig_light = path_mod._light_term
    orig_sample = dense_mod.DenseGrid.sample_nearest

    @contextlib.contextmanager
    def patched(light=False, fetch=False):
        if light:
            path_mod._light_term = (
                lambda grid, pos, ll, p, c, lut, S:
                jnp.full(pos.shape[:-1], 0.02))
        if fetch:
            dense_mod.DenseGrid.sample_nearest = (
                lambda self, pos: jnp.full(pos.shape[:-1], 0.3))
        try:
            yield
        finally:
            path_mod._light_term = orig_light
            dense_mod.DenseGrid.sample_nearest = orig_sample

    # ---- amortized single-chunk walk (the unit the frame is made of) ----
    # In --asset mode the walk positions span the asset's index space and
    # S matches the asset frame's scatter-segment trip count.
    from volumerenderer_tpu.render.color import required_march_steps

    S = required_march_steps(g, 1.0, 4096) if asset else 166
    light_local = g.world_to_index(params.light_source_world_pos)
    config = StaticConfig(width=256, height=256)
    n = 2048
    rs = np.random.RandomState(0)
    if asset:
        lo = np.asarray([-196, -180, -156], np.float32)
        ext = np.asarray([392, 360, 312], np.float32)
        o = jnp.asarray(rs.rand(n, 3) * ext + lo, jnp.float32)
    else:
        o = jnp.asarray(rs.rand(n, 3) * 60 + 18, jnp.float32)
    dd = rs.randn(n, 3)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    d = jnp.asarray(dd, jnp.float32)
    seed0 = jnp.asarray(rs.randint(0, 2**31, (n, 3)), jnp.uint32)
    tmax = jnp.full((n,), 450.0 if asset else 150.0, jnp.float32)
    alive = jnp.ones((n,), bool)
    REP = 24

    def mk_walk():
        @jax.jit
        def f(o, d, seed0, tmax, alive):
            def body(i, acc):
                dc, *_ = path_mod._walk_chunk(
                    g, params, config, None, S, light_local,
                    o, d, seed0, i.astype(jnp.uint32) + jnp.zeros(
                        (n,), jnp.uint32), tmax, alive,
                )
                return acc + jnp.sum(dc)
            return lax.fori_loop(0, REP, body, jnp.zeros(()))
        return f

    chunk_cases = [] if asset else [
        ("walk full", {}), ("walk light=const", dict(light=True)),
    ]
    for label, kw in chunk_cases:
        with patched(**kw):
            f = mk_walk()
            sync(f(o, d, seed0, tmax, alive))
            t0 = time.perf_counter()
            sync(f(o, d, seed0, tmax, alive))
            dt = (time.perf_counter() - t0) / REP
        fetches = n * (-(-S // 32)) * 32  # blocks x 32 samples (SB=32)
        print(f"{label:22s} {dt*1e3:7.2f} ms/chunk "
              f"(~{fetches/dt/1e6:6.0f} Mfetch/s upper bound)", flush=True)

    # ---- whole-frame ablations ----
    side = 512 if asset else 256
    nf = (2, 4) if asset else (8, 32)

    def run(label, **kw):
        with patched(**kw):
            r = Renderer(g, StaticConfig(width=side, height=side), params,
                         algorithm=Algorithm.PATH)
            r.step(nf[0])
            sync(r.state.accum)
            t0 = time.perf_counter()
            r.step(nf[1])
            sync(r.state.accum)
            dt = (time.perf_counter() - t0) / nf[1]
        print(f"{label:22s} {dt*1e3:7.2f} ms/frame", flush=True)
        note(f"done {label}")

    run("frame full")
    run("frame light=const", light=True)
    run("frame fetch=const", fetch=True)
    run("frame both const", light=True, fetch=True)


if __name__ == "__main__":
    main()
