"""Decompose PATH's cached camera-term replay at 1080p (VERDICT r4 weak #1).

Round-5 history of the zero-scatter frame (96^3, 1920x1080, v5e):
  468 ms  round-4 cumsum replay, 127 sequential 16384-ray dispatches
  92.8    bake padded to the cached-tile multiple (16 dispatches)
  67.3    scan-free site-form replay (rank baked, reduce not scan)
  35.0    the same, ONE fused dispatch (this probe, round 5) -- the
          67 -> 35 gap is ~0.38 ms/tile of IN-PROGRAM lax.map loop
          overhead, not host round-trips
  ->      rank-indexed replay (PathView.rank_k/rank_prefix): pass 1
          reads NO per-site plane (rolls are a pure function of
          (seed, iota rank)), pass 2 is one one-hot sweep

This probe prices the production frame, the replay at a tile-width
sweep, and the rank-form ablations.  A sync-floor row (trivial scalar
program) calibrates the per-measurement device round-trip so small
rows are read as deltas above it.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_path_replay.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

W, H = 1920, 1080


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(label, fn, *args, n=8, warm=2):
    for _ in range(warm):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        s = sync(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"  {label:64s} {dt*1e3:8.2f} ms", flush=True)
    return dt * 1e3


def main() -> None:
    print("claiming device...", flush=True)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s", flush=True)

    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.grid import procedural
    from volumerenderer_tpu.render import path as P
    from volumerenderer_tpu.ops import rng

    grid = procedural.cloud(n=96)
    base = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    cfg = StaticConfig(width=W, height=H)

    # --- sync floor: a trivial program, same measurement harness
    zero = jnp.zeros((8,), jnp.float32)
    timeit("sync floor (trivial scalar program)", jax.jit(lambda z: z + 1),
           zero)

    # --- 0. full default PATH frame (today's end-to-end baseline)
    rd = Renderer(grid, cfg, base, algorithm=Algorithm.PATH)
    rd.step(2)
    sync(rd.state.accum)
    t0 = time.perf_counter()
    rd.step(4)
    sync(rd.state.accum)
    print(f"  {'full default PATH frame (prob=0.05, production)':64s} "
          f"{(time.perf_counter()-t0)/4*1e3:8.2f} ms", flush=True)
    del rd

    # --- 1. full cached zero-scatter frame (the production baseline)
    r = Renderer(grid, cfg, base.replace(scattering_probability=0.0),
                 algorithm=Algorithm.PATH)
    r.step(2)
    sync(r.state.accum)
    t0 = time.perf_counter()
    r.step(4)
    sync(r.state.accum)
    full = (time.perf_counter() - t0) / 4 * 1e3
    print(f"  {'full cached zero-scatter frame (production)':64s} "
          f"{full:8.2f} ms", flush=True)

    cache = r._path_view
    n_pad = cache.o_i.shape[0]
    S = cache.rank_prefix.shape[1]
    print(f"  n_pad={n_pad} ({n_pad//16384} x 16384), S={S}", flush=True)
    params = base
    del r

    # --- 2. rank-form replay at a tile sweep
    def replay(cache, tile):
        m = n_pad // tile
        r3 = lambda a: a.reshape(m, tile, 3)
        r1 = lambda a: a.reshape(m, tile)
        r2 = lambda a: a.reshape(m, tile, S)
        seeds = P._seeds(W, H, 0, jnp.uint32(7), n_pad)

        def run(o, d, tmin, n_occ, rank_k, rank_prefix, prefix_total, seeds):
            out = jax.lax.map(
                lambda args: P._seg1_frame_rank(params, S, *args),
                (r3(o), r3(d), r1(tmin), r1(n_occ), r2(rank_k),
                 r2(rank_prefix), r1(prefix_total),
                 seeds.reshape(m, tile, 3)),
            )
            return sum(jnp.sum(x.astype(jnp.float32)) for x in out)

        f = jax.jit(run)
        return lambda: f(cache.o_i, cache.d_i, cache.tmin, cache.n_occ,
                         cache.rank_k, cache.rank_prefix, cache.prefix_total,
                         seeds)

    for t_sw in (16384, 65536, 131072, 262144, 524288, n_pad):
        if n_pad % t_sw == 0:
            timeit(f"rank replay lax.map tile={t_sw} "
                   f"({n_pad//t_sw} dispatches)", replay(cache, t_sw), n=4)

    # --- 3. rank-form component ablations at (131072, S)
    T = 131072
    seeds_t = P._seeds(W, H, 0, jnp.uint32(7), n_pad)[:T]
    rank_k_t = cache.rank_k[:T]
    rank_prefix_t = cache.rank_prefix[:T]
    n_occ_t = cache.n_occ[:T]
    prefix_total_t = cache.prefix_total[:T]
    o, d, tmin = cache.o_i[:T], cache.d_i[:T], cache.tmin[:T]

    @jax.jit
    def c_pass1(seeds):
        ranks = jax.lax.broadcasted_iota(jnp.uint32, (1, S), 1) + jnp.uint32(1)
        roll = rng.randf_at(seeds[:, None, :], ranks)
        hit = roll < jnp.float32(0.05)
        BIG = jnp.uint32(0xFFFFFFFF)
        r_min = jnp.min(jnp.where(hit, ranks, BIG), axis=-1)
        return jnp.sum(r_min.astype(jnp.float32))

    @jax.jit
    def c_pass2(seeds, rank_k, rank_prefix):
        ranks = jax.lax.broadcasted_iota(jnp.uint32, (1, S), 1) + jnp.uint32(1)
        roll = rng.randf_at(seeds[:, None, :], ranks)
        hit = roll < jnp.float32(0.05)
        BIG = jnp.uint32(0xFFFFFFFF)
        r_min = jnp.min(jnp.where(hit, ranks, BIG), axis=-1)
        onehot = ranks == r_min[:, None]
        color = jnp.sum(jnp.where(onehot, rank_prefix, 0.0), axis=-1)
        k_star = jnp.sum(jnp.where(onehot, rank_k.astype(jnp.int32), 0),
                         axis=-1)
        return jnp.sum(color) + jnp.sum(k_star.astype(jnp.float32))

    seg1 = jax.jit(partial(P._seg1_frame_rank, params, S))

    def c_full(o, d, tmin, n_occ, rank_k, rank_prefix, prefix_total, seeds):
        out = seg1(o, d, tmin, n_occ, rank_k, rank_prefix, prefix_total,
                   seeds)
        return out[0]

    timeit("  (131072, S) pass 1: RNG at iota ranks + min-reduce", c_pass1,
           seeds_t)
    timeit("  (131072, S) pass 1+2: + one-hot (rank_k, rank_prefix) sweep",
           c_pass2, seeds_t, rank_k_t, rank_prefix_t)
    timeit("  (131072, S) full _seg1_frame_rank", c_full, o, d, tmin,
           n_occ_t, rank_k_t, rank_prefix_t, prefix_total_t, seeds_t)

    hbm = (cache.rank_k.nbytes + cache.rank_prefix.nbytes) / 1e9
    print(f"\n  rank plane bytes full-frame: {hbm:.2f} GB "
          f"(rank_k uint16, rank_prefix f32)", flush=True)


if __name__ == "__main__":
    main()
