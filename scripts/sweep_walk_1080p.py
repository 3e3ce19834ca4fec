"""Walk-state pack width x chunk width at 1080p (round 5, VERDICT #1).

The scatter walk's stride-INVARIANT floor is the per-chunk packed-state
movement: 13-wide rows gather at ~70 ns/row vs the ~12-14 ns/row plateau
at widths >= 100 (probe_walk_inloop.py), so the (gather + scatter) of
~1.04M chunk-rows/frame costs ~170 ms at width 13.  Round 4 tried
path_pack_width=128 and measured an 18% frame-level LOSS; this sweep
re-measures at the rank-replay HEAD, separates the gather from the
scatter from the frame, and sweeps chunk width (fewer while_loop
iterations amortize the per-iteration fixed cost; the sorted compaction
bounds the straggler tax).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_walk_1080p.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    t0 = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"terminal claimed in {time.perf_counter() - t0:.0f}s", flush=True)

    from volumerenderer_tpu import (Algorithm, Renderer, RenderParams,
                                    StaticConfig)
    from volumerenderer_tpu.grid import procedural

    g = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    # --- in-program gather / scatter rate vs pack width (fori_loop, one
    # sync; N iterations amortize the ~26 ms sync floor)
    n_pad, Wc, N = 2088960, 2048, 256
    rs = np.random.RandomState(3)
    idx = jnp.asarray(rs.permutation(n_pad)[: Wc * N].reshape(N, Wc),
                      jnp.int32)

    for wpack in (13, 104, 128):
        pack0 = jnp.asarray(rs.rand(n_pad, wpack), jnp.float32)

        def loop_gather(pack):
            def body(j, acc):
                st = jnp.take(pack, idx[j], axis=0)
                return acc + jnp.sum(st)
            return jax.lax.fori_loop(0, N, body, jnp.float32(0))

        def loop_gs(pack):
            def body(j, pack):
                st = jnp.take(pack, idx[j], axis=0)
                return pack.at[idx[j]].set(st * 1.000001)
            return jax.lax.fori_loop(0, N, body, pack)

        for label, fn in (("gather", loop_gather), ("gather+scatter",
                                                    loop_gs)):
            f = jax.jit(fn)
            out = f(pack0)
            jax.block_until_ready(out)
            t1 = time.perf_counter()
            out = f(pack0)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t1) / N
            print(f"  width {wpack:3d} {label:15s} {dt*1e6:8.1f} us/chunk "
                  f"({dt/Wc*1e9:6.1f} ns/row)", flush=True)

    # --- production frames: pack width x chunk
    frames = 8
    base_cfg = StaticConfig(width=1920, height=1080)
    rows = []
    for wpack in (13, 104, 128):
        for chunk in (2048, 8192, 16384):
            cfg = dataclasses.replace(base_cfg, path_pack_width=wpack,
                                      path_chunk=chunk)
            r = Renderer(g, cfg, params, algorithm=Algorithm.PATH)
            r.step(2)
            sync(r.state.accum)
            t1 = time.perf_counter()
            r.step(frames)
            checksum = sync(r.state.accum)
            dt = (time.perf_counter() - t1) / frames * 1e3
            mrays = 1920 * 1080 / (dt / 1e3) / 1e6
            rows.append((wpack, chunk, dt, mrays, checksum))
            print(f"  pack={wpack:3d} chunk={chunk:5d}  {dt:7.1f} ms/frame "
                  f"({mrays:5.2f} Mrays/s)  checksum={checksum:.6g}",
                  flush=True)
            del r

    best = min(rows, key=lambda r: r[2])
    print(f"\nbest: pack={best[0]} chunk={best[1]} {best[2]:.1f} ms "
          f"({best[3]:.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
