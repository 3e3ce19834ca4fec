"""Decompose the PATH chunk's per-invocation fixed costs at asset scale.

Measures, at the real frame's shapes (2048 rays x n_cells=78, asset
brick table 49x45x39 = 4410 packed terms > _OCC_SELECT_MAX_TERMS):
  0. a trivial elementwise op (control)
  1. _select_cells as-is (scattered jnp.take occupancy lookups)
  2. the same endpoint test against a COARSE packed table (arithmetic
     select, zero gathers)
  3. lax.top_k(key, n_cells) — the current selected-cell compaction
  4. one-hot rank-compaction — an O(n_cells^2) candidate replacement

METHOD NOTE (two traps, both hit by earlier revisions of this file):
(1) one device sync on this stack costs ~26-30 ms regardless of work
(the axon lazy-client D2H fence), so fori_loop(REP)/REP at small REP
reports mostly floor — rev 1 measured 0.93 ms for EVERYTHING including
the trivial control; (2) a loop body that does not depend on the loop
index is hoisted out by XLA LICM and runs ONCE — rev 2's REP=64 vs 320
slope measured ~0 for everything.  This revision perturbs every input
by the loop index (unhoistable) and reports the slope between REP=64
and REP=320, so floor and call overhead cancel and the body really
executes per iteration.
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
R_LO, R_HI = 64, 320

def bench(label, f, *args):
    """f(i, *args) MUST use the iteration index i (defeats LICM)."""
    def mk(rep):
        fj = jax.jit(lambda *a: lax.fori_loop(
            0, rep, lambda i, acc: acc + jnp.sum(
                f(i, *a).astype(jnp.float32)), jnp.zeros(())))
        sync(fj(*args))  # warm
        t = time.perf_counter()
        sync(fj(*args))
        return time.perf_counter() - t
    lo_t, hi_t = mk(R_LO), mk(R_HI)
    dt = (hi_t - lo_t) / (R_HI - R_LO)
    print(f"{label:34s} {dt*1e3:7.3f} ms/iter "
          f"(raw {lo_t*1e3/R_LO:6.3f} at REP={R_LO})", flush=True)
    note(f"done {label}")
    return dt

def ptb(i, a):
    """Iteration-dependent input perturbation (unhoistable, ~free)."""
    return a + jnp.float32(i) * jnp.float32(1e-12)

bench("trivial elementwise (control)",
      lambda i, o: ptb(i, o) * 2.0 + 1.0, o)

def sel_now(o, d, t0v, tmax, alive):
    s, _ = _select_cells(g, o, d, t0v, tmax, alive,
                         step_size=1.0, max_steps=S, cell=C)
    return s
bench("select_cells (scattered take)",
      lambda i, o, *a: sel_now(ptb(i, o), *a), o, d, t0v, tmax, alive)

from volumerenderer_tpu.ops.march import ray_positions, t_grid  # noqa: F401
from volumerenderer_tpu.grid.dense import _occ_table_lookup, BRICK

def coarse_dil(occ, f):
    w = lax.reduce_window(occ.astype(jnp.uint8), jnp.uint8(0), lax.max,
                          (3 * f, 3 * f, 3 * f), (f, f, f),
                          [(f, 2 * f - 1)] * 3)
    return w.astype(bool)

cd2 = coarse_dil(g.brick_occ, 2)

def sel_coarse(o, d, t0v, tmax, alive, f=2):
    c = jnp.arange(n_cells + 1, dtype=jnp.float32)
    t_c = t_grid(t0v, c * C, 1.0)
    pos = o[:, None, :] + d[:, None, :] * t_c[..., None]
    ijk = jnp.floor(pos).astype(jnp.int32)
    rel = ijk - g.bbox_min
    shape = jnp.asarray(g.voxels.shape, jnp.int32)
    pad = jnp.all((rel >= -BRICK * f) & (rel < shape + BRICK * f), axis=-1)
    relc = jnp.clip(rel, 0, shape - 1) // (BRICK * f)
    occ = _occ_table_lookup(cd2, relc) & pad
    s = occ[..., :-1] | occ[..., 1:]
    return s & alive[..., None] & (t_c[..., :-1] < tmax[..., None])
bench("select_cells coarse packed f=2",
      lambda i, o, *a: sel_coarse(ptb(i, o), *a), o, d, t0v, tmax, alive)

sf = np.asarray(jax.jit(sel_now)(o, d, t0v, tmax, alive))
sc = np.asarray(jax.jit(sel_coarse)(o, d, t0v, tmax, alive))
assert (sf <= sc).all(), "coarse selection must be a superset"
print(f"superset ok; fine density {sf.mean():.3f} coarse {sc.mean():.3f}",
      flush=True)

sel = jnp.asarray(sf)
ci = jnp.arange(n_cells, dtype=jnp.int32)
def topk(sel):
    key = jnp.where(sel, n_cells - ci, 0)
    kv, idx_c = lax.top_k(key, n_cells)
    return idx_c + (kv > 0)
def shift(i, sel):
    return jnp.roll(sel, i, axis=0)
bench("top_k (current)", lambda i, s: topk(shift(i, s)), sel)

def rankc(sel):
    rank = jnp.cumsum(sel.astype(jnp.int32), axis=-1) - 1
    p = jnp.arange(n_cells, dtype=jnp.int32)
    m = sel[..., None, :] & (rank[..., None, :] == p[:, None])
    idx_c = jnp.sum(jnp.where(m, ci, 0), axis=-1)
    nsel = jnp.sum(sel.astype(jnp.int32), axis=-1)
    return idx_c + (p < nsel[..., None])
bench("one-hot rank compaction", lambda i, s: rankc(shift(i, s)), sel)

a = np.asarray(jax.jit(topk)(sel)); b = np.asarray(jax.jit(rankc)(sel))
nsel = np.asarray(sel).sum(-1)
for r in range(0, n, 257):
    k = nsel[r]
    assert (a[r, :k] == b[r, :k]).all(), r
print("selected-slot equivalence ok", flush=True)

# 5. one-hot MXU matmul lookup: occ[lin] as onehot(lin) @ table_flat.
#    0/1 values are exact in bf16; each row of the one-hot has exactly
#    one nonzero, so the f32 accumulation is a single exact term.  The
#    one-hot is generated from iota-compare and (if XLA fuses it into
#    the dot) never touches HBM.
from volumerenderer_tpu.ops.march import intersect  # noqa: F401  (not used)

tbl = g.brick_occ_dil
X, Y, Z = tbl.shape
flat = tbl.reshape(-1).astype(jnp.bfloat16)
N = flat.shape[0]
print(f"matmul lookup N={N}", flush=True)

def sel_mm(o, d, t0v, tmax, alive):
    c = jnp.arange(n_cells + 1, dtype=jnp.float32)
    t_c = t_grid(t0v, c * C, 1.0)
    pos = o[:, None, :] + d[:, None, :] * t_c[..., None]
    ijk = jnp.floor(pos).astype(jnp.int32)
    rel = ijk - g.bbox_min
    shape = jnp.asarray(g.voxels.shape, jnp.int32)
    pad = jnp.all((rel >= -BRICK) & (rel < shape + BRICK), axis=-1)
    relb = jnp.clip(rel, 0, shape - 1) // BRICK
    lin = (relb[..., 0] * Y + relb[..., 1]) * Z + relb[..., 2]
    L = lin.reshape(-1)
    oh = (L[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]
          ).astype(jnp.bfloat16)
    v = jnp.dot(oh, flat, preferred_element_type=jnp.float32)
    occ = (v.reshape(lin.shape) > 0.5) & pad
    s = occ[..., :-1] | occ[..., 1:]
    return s & alive[..., None] & (t_c[..., :-1] < tmax[..., None])

bench("select_cells one-hot MXU matmul",
      lambda i, o, *a: sel_mm(ptb(i, o), *a), o, d, t0v, tmax, alive)
smm = np.asarray(jax.jit(sel_mm)(o, d, t0v, tmax, alive))
assert (smm == sf).all(), "matmul lookup must be bit-equal to take"
print("matmul-lookup exact equality ok", flush=True)

# 6. z-row gather + one-hot select (sample_ijk's fetch formulation applied
#    to the occupancy table): gather a whole z-row of the bool table per
#    endpoint (row length Z is in the measured 32-128 fast-row plateau at
#    asset scale), select the z element in-register.  Exact.
def sel_zrow(o, d, t0v, tmax, alive):
    c = jnp.arange(n_cells + 1, dtype=jnp.float32)
    t_c = t_grid(t0v, c * C, 1.0)
    pos = o[:, None, :] + d[:, None, :] * t_c[..., None]
    ijk = jnp.floor(pos).astype(jnp.int32)
    rel = ijk - g.bbox_min
    shape = jnp.asarray(g.voxels.shape, jnp.int32)
    pad = jnp.all((rel >= -BRICK) & (rel < shape + BRICK), axis=-1)
    relb = jnp.clip(rel, 0, shape - 1) // BRICK
    tb = g.brick_occ_dil
    X2, Y2, Z2 = tb.shape
    rows2d = tb.reshape(X2 * Y2, Z2)
    row = relb[..., 0] * Y2 + relb[..., 1]
    rows = jnp.take(rows2d, row, axis=0, mode="clip")
    selz = (jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
            == relb[..., 2:3])
    occ = jnp.any(rows & selz, axis=-1) & pad
    s = occ[..., :-1] | occ[..., 1:]
    return s & alive[..., None] & (t_c[..., :-1] < tmax[..., None])

bench("select_cells z-row gather",
      lambda i, o, *a: sel_zrow(ptb(i, o), *a), o, d, t0v, tmax, alive)
szr = np.asarray(jax.jit(sel_zrow)(o, d, t0v, tmax, alive))
assert (szr == sf).all(), "z-row lookup must be bit-equal to take"
print("z-row-lookup exact equality ok", flush=True)
