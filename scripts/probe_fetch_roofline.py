"""Asset-scale fetch-wall roofline closure (VERDICT r3 next-step #3).

Converts the ~88 Mfetch/s z-sub-row plateau into ARITHMETIC: for each
fetch formulation at the bunny-shell asset shape (577x572x438, nz divisor
regime of the production asset class), measure rows/s, bytes touched/s,
the fraction of v5e HBM peak (~819 GB/s), and clocks/row — then compare
the renderer's achieved in-march rate against the pure-gather ceiling at
the same index distribution.  Variants isolate WHAT bounds the rate:

  * f32 sub-rows vs bf16 sub-rows of the same element count — if the rate
    is byte-bound, bf16 doubles it; if row-issue-bound, it does not.
  * bf16 sub-rows of 2x the elements (same bytes as f32) — tests whether
    wider rows ride the same issue slot.
  * flat 1-element takes — 1/100th the bytes at a similar row rate is the
    smoking gun for issue-boundedness.
  * sorted vs random row indices — HBM locality sensitivity.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_fetch_roofline.py
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

HBM_PEAK = 819e9  # v5e spec HBM bandwidth, bytes/s
CLOCK = 0.94e9
# 4M fetches through 16 chunks: the 16.7M/64-chunk variant broke the
# remote-compile helper (25-minute compile, then transport broken pipe).
N_FETCH = 1 << 22
CHUNK = 1 << 18


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(label, fn, table, idx, bytes_per_row, n=4):
    # The table MUST be a jit argument: a closure over a device array
    # embeds it as a compile-time constant, and the remote-compile helper
    # rejects the 0.6 GiB payload (HTTP 413).
    @jax.jit
    def run(table, idx):
        return jax.lax.map(lambda c: fn(table, c),
                           idx.reshape(-1, CHUNK)).reshape(-1)

    sync(run(table, idx))
    t0 = time.perf_counter()
    for _ in range(n):
        out = run(table, idx)
    s = sync(out)
    dt = (time.perf_counter() - t0) / n
    rows = idx.shape[0] / dt
    gbs = rows * bytes_per_row / 1e9
    print(f"  {label:44s} {rows/1e6:7.1f} Mrows/s  {gbs:7.1f} GB/s "
          f"({gbs*1e9/HBM_PEAK*100:5.1f}% HBM)  "
          f"{CLOCK/rows:6.1f} clk/row  checksum={s:.1f}", flush=True)
    return rows


def main() -> None:
    print("claiming device...", flush=True)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s", flush=True)

    dims = (577, 572, 438)
    nz = dims[2]
    sub = max((d for d in range(96, 129) if nz % d == 0), default=0)
    if not sub:
        # 438 has no divisor in [96, 129): pad the probe volume's z to the
        # next multiple of a production-regime sub-row, exactly what an
        # ingest-time pad would give this asset class.
        sub = 100  # pragmatic production pick: pad nz 438 -> 500
        nz = 500
        dims = (577, 572, nz)
    nrow = nz // sub
    n_rows_total = dims[0] * dims[1] * nrow
    key = jax.random.PRNGKey(0)
    vol = jax.random.uniform(key, dims, jnp.float32)
    rows_f32 = vol.reshape(-1, sub)
    rows_bf16 = rows_f32.astype(jnp.bfloat16)
    rows_bf16_wide = vol.astype(jnp.bfloat16).reshape(-1, 2 * sub)
    flat = vol.reshape(-1)
    print(f"volume {dims} = {vol.size/1e6:.0f}M voxels "
          f"({vol.size*4/2**30:.2f} GiB f32), sub-row {sub} "
          f"({sub*4} B f32)", flush=True)

    idx = jax.random.randint(
        jax.random.PRNGKey(1), (N_FETCH,), 0, n_rows_total, jnp.int32)
    idx_sorted = jnp.sort(idx)
    idx_wide = jnp.clip(idx // 2, 0, n_rows_total // 2 - 1)
    idx_flat = jax.random.randint(
        jax.random.PRNGKey(2), (N_FETCH,), 0, vol.size, jnp.int32)

    row_sum = lambda t, c: jnp.sum(
        jnp.take(t, c, axis=0, mode="clip").astype(jnp.float32), axis=-1)
    r_f32 = bench(f"f32 sub-row {sub} random", row_sum, rows_f32, idx,
                  sub * 4)
    bench(f"f32 sub-row {sub} SORTED", row_sum, rows_f32, idx_sorted,
          sub * 4)
    r_bf16 = bench(f"bf16 sub-row {sub} random (half bytes)", row_sum,
                   rows_bf16, idx, sub * 2)
    bench(f"bf16 sub-row {2*sub} random (same bytes as f32)", row_sum,
          rows_bf16_wide, idx_wide, sub * 4)
    r_flat = bench("f32 flat 1-element take random",
                   lambda t, c: jnp.take(t, c, mode="clip"),
                   flat, idx_flat, 4)

    print(f"\n  verdict inputs: row rate moves {r_f32/r_flat:.2f}x from "
          f"4 B to {sub*4} B rows; bf16 at half the bytes moves it "
          f"{r_bf16/r_f32:.2f}x", flush=True)

    # ---- achieved in-march rate at the same asset -----------------------
    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.grid.dense import from_dense

    ax = [jnp.linspace(-1, 1, n, dtype=jnp.float32) for n in dims]
    x = ax[0][:, None, None]
    y = ax[1][None, :, None]
    z = ax[2][None, None, :]
    d = jnp.sqrt((x / 0.62) ** 2 + ((y + 0.2) / 0.55) ** 2
                 + (z / 0.58) ** 2) - 1.0
    noise = jax.image.resize(
        jax.random.uniform(jax.random.PRNGKey(42), (48, 48, 48)),
        dims, "trilinear")
    shell = jnp.exp(-jnp.abs(d) * 8.0) * (d < 0.1) * (0.3 + 0.7 * noise)
    volm = jnp.where(shell < 0.03, 0.0, shell).astype(jnp.float32)
    gb = from_dense(np.asarray(volm), voxel_size=70.0 / 577,
                    translation=(-35.0, -15.0, -10.0))
    occ = float(jnp.mean((volm > 0).astype(jnp.float32)))
    del volm, shell, noise, d, vol, rows_f32, rows_bf16, rows_bf16_wide, flat
    print(f"\nshell occupancy {occ*100:.1f}%", flush=True)

    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    r = Renderer(gb, StaticConfig(width=1920, height=1080,
                                  gather_eval="paired"), params,
                 algorithm=Algorithm.POINT)
    r.step(9)
    sync(r.state.accum)
    view = r._view
    live = sum(float(jnp.sum(b.lane_need)) for b in view.bands)
    t0 = time.perf_counter()
    r.step(8)
    sync(r.state.accum)
    spf = (time.perf_counter() - t0) / 8
    print(f"Point 1080p steady frame {spf*1e3:.1f} ms "
          f"({1920*1080/spf/1e6:.1f} Mrays/s); live samples/frame "
          f"{live/1e6:.1f}M", flush=True)
    # Settle rebuild = the fetch-heavy phase: one camera nudge, one frame.
    for fov in (44.9, 45.0):
        r.set(fov=fov)
        r.step(1)
    sync(r.state.accum)
    r.set(fov=44.9)
    t0 = time.perf_counter()
    r.step(1)
    sync(r.state.accum)
    rebuild = time.perf_counter() - t0
    print(f"settle rebuild+shade {rebuild*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
