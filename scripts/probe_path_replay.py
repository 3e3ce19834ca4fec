"""Decompose PATH's cached camera-term replay at 1080p (VERDICT r4 weak #1).

The zero-scatter PATH frame costs 468 ms — 49% of the 953 ms frame — yet
its work is per-(ray, step) RNG replay + prefix lookup with ZERO volume
fetches (render/path.py _seg1_frame over a baked PathView).  Envelope math
puts the VPU + HBM bound at ~5-10 ms, so something is 50-100x off.  This
probe prices each stage at the production shapes on the real chip:

  1. the full cached zero-scatter frame (the 468 ms baseline);
  2. _seg1_frame exactly as production dispatches it (lax.map at the
     bake-pad tile — 1080p pads to 127 x 16384, 127 is PRIME, so the
     "wide cached tile" (path_cached_tile=131072) NEVER materializes:
     _chunk_for falls back to 16384 and the replay pays 127 sequential
     dispatch round-trips);
  3. the same replay over a 131072-multiple pad (16 dispatches) and as
     ONE fused call;
  4. component ablations at (131072, S): cumsum(roll_site), randf_at,
     compare+argmax+any, the two take_along_axis picks, and the scalar
     tail (t_grid/ray_positions/random_dir).

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
    S = cache.prefix.shape[1]
    print(f"  n_pad={n_pad} ({n_pad//16384} x 16384), S={S}", flush=True)
    params = base
    del r

    # --- 2. _seg1_frame as production dispatches it
    def replay(cache, tile, n_pad_use=None):
        npu = n_pad_use or n_pad
        m = npu // tile
        r3 = lambda a: a[:npu].reshape(m, tile, 3)
        r1 = lambda a: a[:npu].reshape(m, tile)
        r2 = lambda a: a[:npu].reshape(m, tile, S)
        seeds = P._seeds(W, H, 0, jnp.uint32(7), npu)

        def run(o, d, tmin, tmax, live, site_rank, n_occ, prefix, seeds):
            out = jax.lax.map(
                lambda args: P._seg1_frame(params, S, *args),
                (r3(o), r3(d), r1(tmin), r1(tmax), r1(live),
                 r2(site_rank), r1(n_occ), r2(prefix),
                 seeds.reshape(m, tile, 3)),
            )
            return sum(jnp.sum(x.astype(jnp.float32)) for x in out)

        f = jax.jit(run)
        return lambda: f(cache.o_i, cache.d_i, cache.tmin, cache.tmax,
                         cache.live, cache.site_rank, cache.n_occ,
                         cache.prefix, seeds)

    for t_sw in (4096, 8192, 16384, 32768, 65536):
        if n_pad % t_sw == 0:
            timeit(f"replay lax.map tile={t_sw} ({n_pad//t_sw} dispatches)",
                   replay(cache, t_sw), n=4)

    # pad to a 131072 multiple
    pad_to = -(-n_pad // 131072) * 131072
    extra = pad_to - n_pad
    import dataclasses as dc
    cache_pad = P.PathView(
        o_i=jnp.pad(cache.o_i, ((0, extra), (0, 0))),
        d_i=jnp.pad(cache.d_i, ((0, extra), (0, 0)),
                    constant_values=0.0).at[n_pad:, 2].set(1.0),
        tmin=jnp.pad(cache.tmin, (0, extra)),
        tmax=jnp.pad(cache.tmax, (0, extra)),
        live=jnp.pad(cache.live, (0, extra)),
        site_rank=jnp.pad(cache.site_rank, ((0, extra), (0, 0))),
        n_occ=jnp.pad(cache.n_occ, (0, extra)),
        prefix=jnp.pad(cache.prefix, ((0, extra), (0, 0))),
    )
    timeit("replay lax.map tile=131072 (17 dispatches, padded)",
           replay(cache_pad, 131072, pad_to), n=4)
    timeit(f"replay ONE fused call (tile={pad_to})",
           replay(cache_pad, pad_to, pad_to), n=4)

    # --- 4. component ablations at (131072, S)
    T = 131072
    seeds_t = P._seeds(W, H, 0, jnp.uint32(7), n_pad)[:T]
    # round-4-formulation ablations on the reconstructed roll-site mask
    roll_site = cache.site_rank[:T] > 0
    site_rank_t, n_occ_t = cache.site_rank[:T], cache.n_occ[:T]
    prefix = cache.prefix[:T]
    tmin, tmax = cache.tmin[:T], cache.tmax[:T]
    o, d, live = cache.o_i[:T], cache.d_i[:T], cache.live[:T]

    @jax.jit
    def c_cumsum(roll_site):
        return jnp.sum(jnp.cumsum(roll_site.astype(jnp.uint32), axis=-1)
                       .astype(jnp.float32))

    @jax.jit
    def c_randf(roll_site, seeds):
        occ_rank = jnp.cumsum(roll_site.astype(jnp.uint32), axis=-1)
        roll = rng.randf_at(seeds[:, None, :], occ_rank)
        return jnp.sum(roll)

    @jax.jit
    def c_randf_iota(seeds):
        # rank axis = iota (no cumsum dependency): prices the hash alone
        ks = jnp.arange(S, dtype=jnp.uint32)[None, :]
        roll = rng.randf_at(seeds[:, None, :], ks)
        return jnp.sum(roll)

    @jax.jit
    def c_scan(roll_site, prefix, seeds):
        occ_rank = jnp.cumsum(roll_site.astype(jnp.uint32), axis=-1)
        roll = rng.randf_at(seeds[:, None, :], occ_rank)
        scatter = roll_site & (roll < jnp.float32(0.05))
        any_sc = jnp.any(scatter, axis=-1)
        k_star = jnp.argmax(scatter, axis=-1)
        return jnp.sum(k_star) + jnp.sum(any_sc)

    @jax.jit
    def c_picks(roll_site, prefix, seeds):
        occ_rank = jnp.cumsum(roll_site.astype(jnp.uint32), axis=-1)
        roll = rng.randf_at(seeds[:, None, :], occ_rank)
        scatter = roll_site & (roll < jnp.float32(0.05))
        any_sc = jnp.any(scatter, axis=-1)
        k_star = jnp.argmax(scatter, axis=-1)
        pick = lambda a: jnp.take_along_axis(a, k_star[:, None], axis=-1)[:, 0]
        color = jnp.where(any_sc, pick(prefix), prefix[:, -1])
        draws = jnp.where(any_sc, pick(occ_rank), occ_rank[:, -1])
        return jnp.sum(color) + jnp.sum(draws.astype(jnp.float32))

    seg1 = jax.jit(partial(P._seg1_frame, params, S))

    def c_full(o, d, tmin, tmax, live, site_rank, n_occ, prefix, seeds):
        out = seg1(o, d, tmin, tmax, live, site_rank, n_occ, prefix, seeds)
        return out[0]

    timeit("  (131072, S) cumsum(roll_site)", c_cumsum, roll_site)
    timeit("  (131072, S) cumsum + randf_at", c_randf, roll_site, seeds_t)
    timeit("  (131072, S) randf_at at iota ranks (no cumsum dep)",
           c_randf_iota, seeds_t)
    timeit("  (131072, S) + compare/any/argmax", c_scan, roll_site, prefix,
           seeds_t)
    timeit("  (131072, S) + 2x take_along_axis picks", c_picks, roll_site,
           prefix, seeds_t)
    timeit("  (131072, S) full _seg1_frame (scan-free)", c_full, o, d,
           tmin, tmax, live, site_rank_t, n_occ_t, prefix, seeds_t)

    hbm = (site_rank_t.nbytes + prefix.nbytes) * (n_pad / T) / 1e9
    print(f"\n  plane bytes full-frame: {hbm:.2f} GB "
          f"(site_rank {cache.site_rank.dtype}, prefix f32)", flush=True)


if __name__ == "__main__":
    main()
