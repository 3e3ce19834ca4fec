"""Decompose the PATH scatter walk per-chunk cost at 1080p (round 5).

probe_path_walkcost.py pinned the walk as stride-INVARIANT (stride 3
cuts per-sample work 3x but the walk barely moves), and the argsort
hypothesis is dead (argsort of 2.08M keys = 5.3 ms on v5e).  This probe
times the chunk's actual constituents at production shape (2048 rays,
S from the 1080p march, march_cell auto) on the real 96^3 grid:

  - _select_cells (the per-chunk dilated-occupancy select)
  - top_k over the selected cells (the ascending-t ordering)
  - one block body: sample_nearest + light term + RNG + reductions
  - the packed-state row gather + scatter (2048 rows from 2.09M)
  - _walk_chunk end to end, on rays re-originated like segment 2

plus the per-segment alive counts of a real 1080p frame (so per-chunk
costs multiply into a frame attribution).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_walk_pieces.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:52s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s", flush=True)

    from volumerenderer_tpu.engine.params import (Fidelity, RenderParams,
                                                  StaticConfig)
    from volumerenderer_tpu.grid import procedural
    from volumerenderer_tpu.ops import intersect, rng
    from volumerenderer_tpu.ops.march import _select_cells, t_grid, \
        ray_positions
    from volumerenderer_tpu.render import path as P
    from volumerenderer_tpu.render.color import required_march_steps

    W, H = 1920, 1080
    grid = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    config = StaticConfig(width=W, height=H)
    S = required_march_steps(grid, 1.0, config.max_march_steps)
    cell = max(1, int(8.0 // 1.0))
    lut_r = 1
    lut = P._make_lut(grid, params, config, lut_r)
    light_local = grid.world_to_index(params.light_source_world_pos)
    print(f"S={S} cell={cell}", flush=True)

    # --- segment-2-like chunk inputs: random scatter sites inside the
    # cloud with isotropic directions (the real distribution after seg1).
    n = config.path_chunk
    rs = np.random.RandomState(7)
    o = jnp.asarray(48.0 + 20.0 * (rs.rand(n, 3) - 0.5), jnp.float32)
    d = rng.random_dir(jnp.asarray(rs.rand(n), jnp.float32),
                       jnp.asarray(rs.rand(n), jnp.float32))
    seed0 = jnp.asarray(rs.randint(0, 2**31, (n, 3)), jnp.uint32)
    seed_draws = jnp.full((n,), 7, jnp.uint32)
    tmax = jnp.full((n,), 400.0, jnp.float32)
    alive = jnp.ones((n,), bool)

    t0v = jnp.full((n,), 1.0, jnp.float32)

    def sel_only(o, d, t0v, tmax, alive):
        return _select_cells(grid, o, d, t0v, tmax, alive,
                             step_size=1.0, max_steps=S, cell=cell)[0]

    dt_sel = bench("_select_cells (2048, S/cell cells)", sel_only,
                   o, d, t0v, tmax, alive)

    n_cells = -(-S // cell)

    def sel_topk(o, d, t0v, tmax, alive):
        sel_c, _ = _select_cells(grid, o, d, t0v, tmax, alive,
                                 step_size=1.0, max_steps=S, cell=cell)
        ci = jnp.arange(n_cells, dtype=jnp.int32)
        key = jnp.where(sel_c, n_cells - ci, 0)
        kv, idx_c = jax.lax.top_k(key, n_cells)
        return kv, idx_c

    dt_topk = bench("select + top_k", sel_topk, o, d, t0v, tmax, alive)

    # --- one block body (32 samples: fetch + light + rng + reductions)
    SB = min(max(8, config.path_subblock), S)

    def block_body(o, d, seed0, seed_draws, tmax, alive):
        ks = jnp.arange(SB, dtype=jnp.float32)
        tt = t_grid(t0v, ks, 1.0)
        pos = ray_positions(o, d, tt)
        val = grid.sample_nearest(pos)
        roll_site = (val > 0.0) & alive[:, None] & (tt < tmax[:, None])
        rank = jnp.cumsum(roll_site.astype(jnp.uint32), axis=-1)
        roll = rng.randf_at(seed0[:, None, :], seed_draws[:, None] + rank)
        scatter = roll_site & (roll < params.scattering_probability)
        before = jnp.cumsum(scatter.astype(jnp.int32), axis=-1) - scatter
        contrib = roll_site & (before == 0)
        light_in = P._light_term(grid, pos, light_local, params, config,
                                 lut, S)
        color = jnp.sum(jnp.where(contrib, val * 1.0 * light_in, 0.0),
                        axis=-1)
        first_sc = scatter & (before == 0)
        st = jnp.sum(jnp.where(first_sc, tt, 0.0), axis=-1)
        dr = jnp.sum(jnp.where(first_sc, rank, jnp.uint32(0)), axis=-1)
        return color, st, dr

    dt_block = bench("one 32-sample block (fetch+light+rng)", block_body,
                     o, d, seed0, seed_draws, tmax, alive)

    def block_nofetch(o, d, seed0, seed_draws, tmax, alive):
        ks = jnp.arange(SB, dtype=jnp.float32)
        tt = t_grid(t0v, ks, 1.0)
        pos = ray_positions(o, d, tt)
        val = jnp.sum(pos, axis=-1) * 1e-3  # stand-in: no volume fetch
        roll_site = (val > 0.0) & alive[:, None] & (tt < tmax[:, None])
        rank = jnp.cumsum(roll_site.astype(jnp.uint32), axis=-1)
        roll = rng.randf_at(seed0[:, None, :], seed_draws[:, None] + rank)
        scatter = roll_site & (roll < params.scattering_probability)
        before = jnp.cumsum(scatter.astype(jnp.int32), axis=-1) - scatter
        contrib = roll_site & (before == 0)
        light_in = P._light_term(grid, pos, light_local, params, config,
                                 lut, S)
        color = jnp.sum(jnp.where(contrib, val * 1.0 * light_in, 0.0),
                        axis=-1)
        first_sc = scatter & (before == 0)
        st = jnp.sum(jnp.where(first_sc, tt, 0.0), axis=-1)
        dr = jnp.sum(jnp.where(first_sc, rank, jnp.uint32(0)), axis=-1)
        return color, st, dr

    bench("  ... same block, fetch replaced by arith", block_nofetch,
          o, d, seed0, seed_draws, tmax, alive)

    # --- packed-state row traffic at 1080p n_pad
    n_pad = 2088960
    pack = jnp.zeros((n_pad, 13), jnp.float32)
    idc = jnp.asarray(rs.randint(0, n_pad, n), jnp.int32)

    def row_traffic(pack, idc):
        st = jnp.take(pack, idc, axis=0)
        return pack.at[idc].set(st + 1.0)

    dt_rows = bench("pack row gather+scatter (2048 of 2.09M)",
                    row_traffic, pack, idc)

    # --- whole _walk_chunk at segment-2 shape
    wk = functools.partial(P._walk_chunk, grid, params, config, lut, S,
                           light_local, march_cell=cell)

    def chunk_all(o, d, seed0, seed_draws, tmax, alive):
        return wk(o, d, seed0, seed_draws, tmax, alive)

    dt_chunk = bench("_walk_chunk end-to-end (seg2-like)", chunk_all,
                     o, d, seed0, seed_draws, tmax, alive)

    # --- per-segment alive counts of a REAL 1080p frame
    view = P.bake_path_view(grid, params, config, S,
                            shadow_lut_radius=lut_r)
    n_padv = view.o_i.shape[0]
    seeds = P._seeds(W, H, 0, jnp.uint32(1), n_padv)
    tile = P._chunk_for(n_padv, P._cached_tile_target(config, S))
    m = n_padv // tile
    r3 = lambda a: a.reshape(m, tile, 3)
    r1 = lambda a: a.reshape(m, tile)
    r2 = lambda a: a.reshape(m, tile, view.rank_k.shape[-1])
    color, o2, d2, sd2, al2 = jax.lax.map(
        lambda args: P._seg1_frame_rank(params, S, *args),
        (r3(view.o_i), r3(view.d_i), r1(view.tmin), r1(view.n_occ),
         r2(view.rank_k), r2(view.rank_prefix), r1(view.prefix_total),
         r3(seeds)),
    )
    o2, d2 = o2.reshape(n_padv, 3), d2.reshape(n_padv, 3)
    sd2, al2 = sd2.reshape(n_padv), al2.reshape(n_padv)
    tmaxv = view.tmax
    counts = [int(jnp.sum(al2.astype(jnp.int32)))]
    oC, dC, sdC, alC = o2, d2, sd2, al2
    colorC = color.reshape(n_padv)
    for _seg in range(2, config.max_path_segments + 1):
        dc, oC, dC, sdC, alC = P._walk_segment(
            grid, params, config, lut, S, light_local,
            oC, dC, seeds, sdC, tmaxv, alC, march_cell=cell)
        colorC = colorC + dc
        counts.append(int(jnp.sum(alC.astype(jnp.int32))))
    print("alive entering segments 2..%d: %s"
          % (config.max_path_segments, counts[:-1]), flush=True)
    print("alive after final segment:", counts[-1], flush=True)
    chunks = sum(-(-c // config.path_chunk) for c in counts[:-1] if c)
    print(f"chunk iterations/frame ~= {chunks}", flush=True)
    print(f"attribution: chunks x select+topk = {chunks*dt_topk*1e3:.0f} ms, "
          f"x block = {chunks*dt_block*1e3:.0f} ms (x trips), "
          f"x rows = {chunks*dt_rows*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
