"""Deep-z fetch formulations on TPU (round-3 follow-up to
microbench_fetch.py): whole-z-row gather vs the sub-row split that
DenseGrid.sample_ijk ships for nz > 128 (_zrow_len — largest divisor of
nz <= 128), at the production asset's depth (nz = 312, sub = 104).

All formulations are bit-exact (one-hot select of the same data); only
the gathered row length and table size differ.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/microbench_zrow_deep.py
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


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


CHUNK = 1 << 18  # fetch through bounded chunks like the renderer's
                 # ray-tiled marches (whole-row tables at 16.7M fetches
                 # are a 25.7 GB compile-time OOM — the documented class)


def bench(name, fn, vol, idx, n=5):
    @jax.jit
    def run(vol, idx):
        return jax.lax.map(lambda c: fn(vol, c),
                           idx.reshape(-1, CHUNK, 3)).reshape(-1)

    sync(run(vol, idx))
    t0 = time.perf_counter()
    for _ in range(n):
        out = run(vol, idx)
    s = sync(out)
    dt = (time.perf_counter() - t0) / n
    rate = idx.shape[0] / dt / 1e6
    print(f"{name:28s} {dt * 1e3:8.1f} ms  {rate:7.1f} Mfetch/s"
          f"  checksum={s:.1f}", flush=True)
    return rate


def main() -> None:
    print("claiming device...", flush=True)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s", flush=True)

    nx, ny, nz = 392, 360, 312  # the production-asset shape
    rs = np.random.RandomState(0)
    vol = jnp.asarray(rs.rand(nx, ny, nz).astype(np.float32))
    N = 1 << 24  # 16.7M fetches
    idx = jnp.asarray(
        np.stack([rs.randint(0, nx, N), rs.randint(0, ny, N),
                  rs.randint(0, nz, N)], -1).astype(np.int32))

    def flat(vol, idx):
        lin = (idx[..., 0] * ny + idx[..., 1]) * nz + idx[..., 2]
        return jnp.take(vol.reshape(-1), lin, mode="clip")

    def rows(sub):
        nrow = nz // sub

        def f(vol, idx):
            rows2d = vol.reshape(-1, sub)
            row = (idx[..., 0] * ny + idx[..., 1]) * nrow + idx[..., 2] // sub
            r = jnp.take(rows2d, row, axis=0, mode="clip")
            sel = (jax.lax.broadcasted_iota(jnp.int32, r.shape, r.ndim - 1)
                   == (idx[..., 2:3] % sub))
            return jnp.sum(jnp.where(sel, r, 0.0), axis=-1)

        return f

    base = bench("flat take", flat, vol, idx)
    full = bench("z-row len=312 (round 2)", rows(312), vol, idx)
    for sub in (104, 78, 52):
        bench(f"z-sub-row len={sub}", rows(sub), vol, idx)
    print(f"(flat={base:.0f}, whole-row={full:.0f} Mfetch/s baselines)")


if __name__ == "__main__":
    main()
