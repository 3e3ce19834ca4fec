"""Probe: same-shape take_along_axis from a VMEM-resident volume in Pallas.

The r3 microbench (microbench_fetch.py --probe-pallas) showed Mosaic's only
gather lowering is tpu.dynamic_gather in the batched take-along-axis form
where input, indices and output SHARE one 2D shape.  Its probe passed
(TILE, 1) indices against the (N*N, N) table and was rejected.  This probe
obeys the constraint instead of violating it: broadcast the per-sample row
index across the lane axis so indices are exactly the table's shape, gather
whole rows along axis 0 (or, transposed, whole columns along axis 1), then
select the z element in-register with a one-hot sum.

If either form compiles, a scattered volume fetch becomes VMEM-bandwidth
work instead of an HBM row gather — the candidate to break the 272 Mfetch/s
z-row plateau that bounds PATH (BENCHMARKS.md).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_vmem_gather.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, *args, n=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = sync(out)
    return (time.perf_counter() - t0) / n, s


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    t0 = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"terminal claimed in {time.perf_counter() - t0:.0f}s", flush=True)

    N = 96
    R = N * N  # 9216 rows
    M = 16_777_216 // R * R  # multiple of R, ~16.7M fetches
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((N, N, N), np.float32))
    idx = jnp.asarray(rng.integers(0, N, (M, 3)), jnp.int32)
    row = idx[:, 0] * N + idx[:, 1]
    z = idx[:, 2]

    # Reference result (z-row XLA formulation, known bit-exact).
    @jax.jit
    def zrow(vol, row, z):
        rows2d = vol.reshape(-1, N)
        rows = jnp.take(rows2d, row, axis=0, mode="clip")
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
            == z[:, None]
        )
        return jnp.sum(jnp.where(sel, rows, 0.0), axis=-1)

    dt, s_ref = bench(zrow, vol, row, z)
    print(f"zrow XLA          {dt * 1e3:8.1f} ms  {M / dt / 1e6:7.1f} Mfetch/s"
          f"  (checksum {s_ref:.1f})", flush=True)
    want = np.asarray(zrow(vol, row, z))

    # ---- Form A: sublane-axis gather, everything (R, N)-shaped ----
    def kern_a(vol_ref, row_ref, z_ref, o_ref):
        v = vol_ref[...]
        idxb = jnp.broadcast_to(row_ref[...][:, None], v.shape)
        rows = jnp.take_along_axis(v, idxb, axis=0)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
            == z_ref[...][:, None]
        )
        o_ref[...] = jnp.sum(jnp.where(sel, rows, 0.0), axis=-1)

    def call_a(v, r, l):
        return pl.pallas_call(
            kern_a,
            grid=(M // R,),
            in_specs=[
                pl.BlockSpec((R, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M,), jnp.float32),
        )(v, r, l)

    try:
        fa = jax.jit(call_a)
        out = fa(vol.reshape(R, N), row, z)
        got = np.asarray(out)
        ok = np.array_equal(got, want)
        dt, s = bench(fa, vol.reshape(R, N), row, z)
        print(f"A sublane VMEM    {dt * 1e3:8.1f} ms  {M / dt / 1e6:7.1f}"
              f" Mfetch/s  bit-exact={ok} (checksum {s:.1f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"A sublane VMEM    FAILED: {type(e).__name__}:"
              f" {str(e).splitlines()[0][:200]}", flush=True)

    # ---- Form B: lane-axis gather on the transposed volume (N, R) ----
    def kern_b(volt_ref, row_ref, z_ref, o_ref):
        v = volt_ref[...]
        idxb = jnp.broadcast_to(row_ref[...][None, :], v.shape)
        cols = jnp.take_along_axis(v, idxb, axis=1)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, cols.shape, 0)
            == z_ref[...][None, :]
        )
        o_ref[...] = jnp.sum(jnp.where(sel, cols, 0.0), axis=0)

    def call_b(vt, r, l):
        return pl.pallas_call(
            kern_b,
            grid=(M // R,),
            in_specs=[
                pl.BlockSpec((N, R), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((R,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M,), jnp.float32),
        )(vt, r, l)

    vt = vol.reshape(R, N).T.copy()  # (N, R): volT[z, rowid]
    try:
        fb = jax.jit(call_b)
        got = np.asarray(fb(vt, row, z))
        ok = np.array_equal(got, want)
        dt, s = bench(fb, vt, row, z)
        print(f"B lane VMEM       {dt * 1e3:8.1f} ms  {M / dt / 1e6:7.1f}"
              f" Mfetch/s  bit-exact={ok} (checksum {s:.1f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"B lane VMEM       FAILED: {type(e).__name__}:"
              f" {str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
