"""Microbenchmark: random volume-fetch formulations on TPU (VERDICT r2
weak #4 / next #5 — "test the PATH VMEM hypothesis").

The r2 claim was that TPU random gather tops out at ~110 Mfetch/s.  This
script shows that wall was the FLAT-jnp.take formulation's, not the
hardware's, and records why an in-Pallas VMEM-resident fetch kernel is not
expressible in this Pallas/Mosaic version:

  * flat:   vals = take(volume.reshape(-1), lin)            (the r2 wall)
  * zrow:   gather the whole contiguous z-row per sample, then select the
            element in-register with a one-hot compare+sum — XLA lowers
            full-minor-dim row gathers to much wider HBM transactions
            (measured ~2.5x: 272 vs 109 Mfetch/s at 96^3 on v5e).  This is
            what DenseGrid.sample_ijk ships for nz <= 512 (bit-exact).
  * pallas: a VMEM-resident gather kernel CANNOT be written today —
            Mosaic's only gather lowering is tpu.dynamic_gather in the
            batched take-along-axis form (jax/_src/pallas/mosaic/
            lowering.py::_gather_lowering_rule): input, indices and output
            must share one 2D shape and the gather runs within a row or a
            column of that block.  A scattered fetch (arbitrary (row,lane)
            per output element) has no lowering; probes fail with the
            rule's "Shape mismatch in input, indices and output" /
            "Unsupported gather".  This script demonstrates the failure
            reproducibly rather than hand-waving it (run with
            --probe-pallas).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/microbench_fetch.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
    # axon's TPU client is lazy: block_until_ready returns at enqueue, so a
    # scalar readback is the only trustworthy timing fence.
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
    _ = float(jnp.zeros((), jnp.float32))  # claim the terminal up front

    N = 96
    M = 16_777_216  # 16.7M fetches, the r2 probe size
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((N, N, N), np.float32))
    idx = jnp.asarray(rng.integers(0, N, (M, 3)), jnp.int32)

    @jax.jit
    def flat(vol, idx):
        lin = (idx[:, 0] * N + idx[:, 1]) * N + idx[:, 2]
        return jnp.take(vol.reshape(-1), lin, mode="clip")

    @jax.jit
    def zrow(vol, idx):
        rows2d = vol.reshape(-1, N)
        row = idx[:, 0] * N + idx[:, 1]
        rows = jnp.take(rows2d, row, axis=0, mode="clip")
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
            == idx[:, 2:3]
        )
        return jnp.sum(jnp.where(sel, rows, 0.0), axis=-1)

    results = {}
    for name, fn in (("flat jnp.take", flat), ("z-row + one-hot", zrow)):
        dt, s = bench(fn, vol, idx)
        results[name] = M / dt / 1e6
        print(f"{name:20s} {dt * 1e3:8.1f} ms  {M / dt / 1e6:7.1f} Mfetch/s"
              f"  (checksum {s:.1f})", flush=True)

    if "--probe-pallas" in sys.argv:
        # The VMEM-resident kernel attempt: volume rows2d fits VMEM
        # (96^2 x 96 x 4 B = 3.4 MB); per-block scattered fetch via
        # take_along_axis.  Mosaic rejects it — the indices block cannot
        # have a different shape than the table block.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TILE = 2048

        def kern(vol_ref, row_ref, lane_ref, o_ref):
            rows = jnp.take_along_axis(  # (TILE, N) wanted from (N*N, N)
                vol_ref[...], row_ref[...][:, None], axis=0
            )
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
                == lane_ref[...][:, None]
            )
            o_ref[...] = jnp.sum(jnp.where(sel, rows, 0.0), axis=-1)

        try:
            f = jax.jit(lambda v, r, l: pl.pallas_call(
                kern,
                grid=(M // TILE,),
                in_specs=[
                    pl.BlockSpec((N * N, N), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M,), jnp.float32),
            )(v, r, l))
            row = idx[:, 0] * N + idx[:, 1]
            sync(f(vol.reshape(-1, N), row, idx[:, 2]))
            print("pallas VMEM gather: unexpectedly compiled+ran")
        except Exception as e:  # noqa: BLE001 — the failure IS the result
            print(f"pallas VMEM gather: NOT expressible — {type(e).__name__}:"
                  f" {str(e).splitlines()[0][:160]}", flush=True)

    speedup = results["z-row + one-hot"] / results["flat jnp.take"]
    print(f"z-row speedup over flat: {speedup:.2f}x", flush=True)


if __name__ == "__main__":
    main()
