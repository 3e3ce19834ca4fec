"""In-program per-iteration cost of the PATH chunk loop (round 5).

probe_walk_pieces.py's micro-jits all bottom out at the ~1.3-1.8 ms
PER-DISPATCH floor of the remote tunnel, so per-chunk costs must be
measured INSIDE one program: run N loop iterations under lax.fori_loop
with a data dependence and divide.  Pieces, at production shapes
(pack = (2.09M, 13) f32, chunk 2048, 96^3 grid):

  a. row gather only            (take 2048 pack rows)
  b. row gather + scatter-back  (the suspected full-pack copy per
                                 iteration: .at[idx].set on a carry that
                                 is also read — if XLA can't prove
                                 in-place, each iteration copies 108 MB
                                 = ~130 us, x512 chunks = the walk's
                                 stride-invariant floor)
  c. b + _select_cells + top_k  (the per-chunk prologue)
  d. the full segment chunk body (semantics-free idx: first 2048*N rows)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_walk_inloop.py
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


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s", flush=True)

    from volumerenderer_tpu.engine.params import RenderParams, StaticConfig
    from volumerenderer_tpu.grid import procedural
    from volumerenderer_tpu.ops import rng
    from volumerenderer_tpu.ops.march import _select_cells
    from volumerenderer_tpu.render import path as P
    from volumerenderer_tpu.render.color import required_march_steps

    grid = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    config = StaticConfig(width=1920, height=1080)
    S = required_march_steps(grid, 1.0, config.max_march_steps)
    cell = 8
    lut = P._make_lut(grid, params, config, 1)
    light_local = grid.world_to_index(params.light_source_world_pos)

    n_pad, Wc, N = 2088960, 2048, 256
    rs = np.random.RandomState(3)
    pack0 = jnp.asarray(rs.rand(n_pad, 13), jnp.float32)
    # scatter sites inside the cloud for plausible walk content
    pack0 = pack0.at[:, 0:3].set(
        jnp.asarray(48.0 + 20.0 * (rs.rand(n_pad, 3) - 0.5), jnp.float32))
    d_all = rng.random_dir(jnp.asarray(rs.rand(n_pad), jnp.float32),
                           jnp.asarray(rs.rand(n_pad), jnp.float32))
    pack0 = pack0.at[:, 3:6].set(d_all)
    pack0 = pack0.at[:, 10].set(400.0)
    pack0 = pack0.at[:, 11].set(1.0)
    idx = jnp.asarray(rs.permutation(n_pad)[: Wc * N].reshape(N, Wc),
                      jnp.int32)

    def timeit(label, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"  {label:46s} {dt/N*1e6:9.1f} us/iter  ({dt*1e3:6.1f} ms /{N})",
              flush=True)
        return dt / N

    def loop_gather(pack):
        def body(j, acc):
            st = jnp.take(pack, idx[j], axis=0)
            return acc + jnp.sum(st)
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    timeit("a. row gather only", loop_gather, pack0)

    def loop_gs(pack):
        def body(j, pack):
            st = jnp.take(pack, idx[j], axis=0)
            return pack.at[idx[j]].set(st * 1.000001)
        return jax.lax.fori_loop(0, N, body, pack)

    timeit("b. gather + scatter-back (carry pack)", loop_gs, pack0)

    n_cells = -(-S // cell)

    def loop_sel(pack):
        def body(j, pack):
            st = jnp.take(pack, idx[j], axis=0)
            o, d = st[:, 0:3], st[:, 3:6]
            t0v = jnp.full((Wc,), 1.0, jnp.float32)
            sel_c, _ = _select_cells(grid, o, d, t0v, st[:, 10],
                                     st[:, 11] != 0.0, step_size=1.0,
                                     max_steps=S, cell=cell)
            ci = jnp.arange(n_cells, dtype=jnp.int32)
            key = jnp.where(sel_c, n_cells - ci, 0)
            kv, idx_c = jax.lax.top_k(key, n_cells)
            st = st.at[:, 12].add(jnp.sum(kv, axis=-1).astype(jnp.float32)
                                  * 1e-6)
            return pack.at[idx[j]].set(st)
        return jax.lax.fori_loop(0, N, body, pack)

    timeit("c. b + select_cells + top_k", loop_sel, pack0)

    wk = functools.partial(P._walk_chunk, grid, params, config, lut, S,
                           light_local, march_cell=cell)
    _f32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    _u32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)

    def loop_full(pack):
        def body(j, pack):
            st = jnp.take(pack, idx[j], axis=0)
            dc, o2, d2, sd2, al2 = wk(
                st[:, 0:3], st[:, 3:6], _u32(st[:, 6:9]), _u32(st[:, 9]),
                st[:, 10], st[:, 11] != 0.0)
            st2 = jnp.concatenate(
                [o2, d2, st[:, 6:9], _f32(sd2)[:, None], st[:, 10:11],
                 al2.astype(jnp.float32)[:, None],
                 (st[:, 12] + dc)[:, None]], axis=1)
            return pack.at[idx[j]].set(st2)
        return jax.lax.fori_loop(0, N, body, pack)

    timeit("d. full chunk body (gather+walk+scatter)", loop_full, pack0)


if __name__ == "__main__":
    main()
