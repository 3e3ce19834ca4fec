"""Decompose the PATH chunk's per-invocation fixed costs at asset scale.

Times, at the real frame's shapes (2048 rays x n_cells=78 cells, asset
brick table 49x45x39 = 4410 packed terms > _OCC_SELECT_MAX_TERMS):
  1. _select_cells as-is (scattered jnp.take occupancy lookups)
  2. the same endpoint test against a COARSE packed table (arithmetic
     select, zero gathers) — the proposed large-volume formulation
  3. lax.top_k(key, n_cells) — the current selected-cell compaction
  4. one-hot rank-compaction — the proposed O(n_cells^2) replacement
"""
from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

T0 = time.perf_counter()
def note(m):
    print(f"[sc {time.perf_counter()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)
note("claiming TPU terminal...")
_ = float(jnp.zeros((), jnp.float32))
note("claimed")

from volumerenderer_tpu import RenderParams
from volumerenderer_tpu.grid.dense import from_dense
from volumerenderer_tpu.ops.march import _select_cells
from volumerenderer_tpu.render.color import required_march_steps

def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))

dense = np.load(os.path.join(os.path.dirname(__file__), os.pardir,
                             ".cache", "asset_vol.npy"))
g = from_dense(dense, bbox_min=(-196, -180, -156), voxel_size=0.125,
               translation=(0.0, 20.0, 20.0))
params = RenderParams.default()
S = required_march_steps(g, 1.0, 4096)
n, C = 2048, 8
n_cells = -(-S // C)
print(f"S={S} n_cells={n_cells} brick_table={g.brick_occ_dil.shape}",
      flush=True)

rs = np.random.RandomState(0)
lo = np.asarray([-196, -180, -156], np.float32)
ext = np.asarray([392, 360, 312], np.float32)
o = jnp.asarray(rs.rand(n, 3) * ext + lo, jnp.float32)
dd = rs.randn(n, 3); dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
d = jnp.asarray(dd, jnp.float32)
t0v = jnp.full((n,), 1.0, jnp.float32)
tmax = jnp.full((n,), 450.0, jnp.float32)
alive = jnp.ones((n,), bool)
REP = 32

def bench(label, f, *args):
    g_ = jax.jit(lambda *a: lax.fori_loop(
        0, REP, lambda i, acc: acc + jnp.sum(
            f(*a).astype(jnp.float32)), jnp.zeros(())))
    sync(g_(*args))
    t = time.perf_counter()
    sync(g_(*args))
    dt = (time.perf_counter() - t) / REP
    print(f"{label:34s} {dt*1e3:7.3f} ms", flush=True)
    note(f"done {label}")
    return dt

# 1. _select_cells as-is
def sel_now(o, d, t0v, tmax, alive):
    s, _ = _select_cells(g, o, d, t0v, tmax, alive,
                         step_size=1.0, max_steps=S, cell=C)
    return s
bench("select_cells (scattered take)", sel_now, o, d, t0v, tmax, alive)

# 2. coarse packed endpoint test
from volumerenderer_tpu.ops.march import ray_positions, t_grid  # noqa: F401
from volumerenderer_tpu.grid.dense import _occ_table_lookup, BRICK

def coarse_dil(occ, f):
    w = lax.reduce_window(occ.astype(jnp.uint8), jnp.uint8(0), lax.max,
                          (3 * f, 3 * f, 3 * f), (f, f, f),
                          [(f, 2 * f - 1)] * 3)
    return w.astype(bool)

def sel_coarse(o, d, t0v, tmax, alive, f=2):
    cd = coarse_dil(g.brick_occ, f)
    c = jnp.arange(n_cells + 1, dtype=jnp.float32)
    t_c = t_grid(t0v, c * C, 1.0)
    pos = o[:, None, :] + d[:, None, :] * t_c[..., None]
    ijk = jnp.floor(pos).astype(jnp.int32)
    rel = ijk - g.bbox_min
    shape = jnp.asarray(g.voxels.shape, jnp.int32)
    pad = jnp.all((rel >= -BRICK * f) & (rel < shape + BRICK * f), axis=-1)
    relc = jnp.clip(rel, 0, shape - 1) // (BRICK * f)
    occ = _occ_table_lookup(cd, relc) & pad
    s = occ[..., :-1] | occ[..., 1:]
    return s & alive[..., None] & (t_c[..., :-1] < tmax[..., None])
dt = bench("select_cells coarse packed f=2", sel_coarse, o, d, t0v, tmax, alive)

# sanity: coarse is a superset of fine
sf = np.asarray(jax.jit(sel_now)(o, d, t0v, tmax, alive))
sc = np.asarray(jax.jit(sel_coarse)(o, d, t0v, tmax, alive))
assert (sf <= sc).all(), "coarse selection must be a superset"
print(f"superset ok; fine density {sf.mean():.3f} coarse {sc.mean():.3f}",
      flush=True)

# 3. top_k vs 4. rank compaction
sel = jnp.asarray(sf)
ci = jnp.arange(n_cells, dtype=jnp.int32)
def topk(sel):
    key = jnp.where(sel, n_cells - ci, 0)
    kv, idx_c = lax.top_k(key, n_cells)
    return idx_c + (kv > 0)
bench("top_k (current)", topk, sel)

def rankc(sel):
    rank = jnp.cumsum(sel.astype(jnp.int32), axis=-1) - 1
    # out[p] = sum_c (sel[c] & rank[c]==p) * c ; ok[p] = p < nsel
    p = jnp.arange(n_cells, dtype=jnp.int32)
    m = sel[..., None, :] & (rank[..., None, :] == p[:, None])
    idx_c = jnp.sum(jnp.where(m, ci, 0), axis=-1)
    nsel = jnp.sum(sel.astype(jnp.int32), axis=-1)
    return idx_c + (p < nsel[..., None])
bench("one-hot rank compaction", rankc, sel)

# equivalence on selected slots
a = np.asarray(jax.jit(topk)(sel)); b = np.asarray(jax.jit(rankc)(sel))
nsel = np.asarray(sel).sum(-1)
for r in range(0, n, 257):
    k = nsel[r]
    assert (a[r, :k] == b[r, :k]).all(), r
print("selected-slot equivalence ok", flush=True)
