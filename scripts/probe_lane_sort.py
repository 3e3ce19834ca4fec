"""Lane-ordering cost: argsort vs counting-rank at the 1080p build shape.

build_compact_view_device orders 2M lanes by descending occupancy count
(jnp.argsort(-counts, stable)).  Counts take ~145 distinct values
(0..n_cells*cell), so a stable counting rank — histogram + per-bucket
prefix — yields the IDENTICAL permutation:

  rank(r) = (# rays with count > counts[r])
          + (# earlier rays with count == counts[r])

Variants (slope between REP points, iteration-perturbed inputs — see
probe_select_cost.py for the method traps):
  1. jnp.argsort(-counts, stable=True)            (current)
  2. counting rank via one-hot cumsum over buckets
  3. counting rank + the position scatter (inv_map construction)
plus a bit-equality check of the resulting permutations.
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
    print(f"[ls {time.perf_counter()-T0:6.1f}s] {m}", file=sys.stderr,
          flush=True)
note("claiming TPU terminal...")
_ = float(jnp.zeros((), jnp.float32))
note("claimed")

def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))

N = 1920 * 1080
NB = 145  # distinct count values at 1080p/96^3 (n_cells=144, cell=8 -> /8)
rs = np.random.RandomState(0)
# realistic shape: ~45% misses (count 0), occupied counts clustered
raw = np.where(rs.rand(N) < 0.45, 0, rs.randint(1, NB, N))
counts = jnp.asarray(raw, jnp.int32)

R_LO, R_HI = 2, 8

def bench(label, f):
    def mk(rep):
        fj = jax.jit(lambda c: lax.fori_loop(
            0, rep, lambda i, acc: acc + jnp.sum(f((c + i) % NB)),
            jnp.zeros(())))
        sync(fj(counts))
        t = time.perf_counter(); sync(fj(counts))
        return time.perf_counter() - t
    lo, hi = mk(R_LO), mk(R_HI)
    dt = (hi - lo) / (R_HI - R_LO)
    print(f"{label:34s} {dt*1e3:8.2f} ms", flush=True)
    note(f"done {label}")
    return dt

def srt(c):
    return jnp.argsort(-c, stable=True).astype(jnp.int32)

def counting_rank(c):
    # hist over buckets; above[b] = # elements in buckets sorted BEFORE b
    # (descending count order).  within[r] = prefix count of equal-count
    # rays — a lax.scan over ray tiles carrying the running per-bucket
    # histogram (memory: one (NB, K) one-hot per step, not (NB, N)).
    buckets = jnp.arange(NB, dtype=jnp.int32)
    K = 8192
    M = -(-N // K)
    pad = M * K - N
    cp = jnp.pad(c, (0, pad), constant_values=-1).reshape(M, K)

    def step(carry_hist, c_tile):
        oh = (c_tile[None, :] == buckets[:, None]).astype(jnp.int32)
        intile = jnp.cumsum(oh, axis=1) - oh  # equal-count prefix in tile
        within_t = jnp.take(carry_hist, jnp.clip(c_tile, 0, NB - 1)) + \
            jnp.sum(jnp.where(oh.astype(bool), intile, 0), axis=0)
        return carry_hist + jnp.sum(oh, axis=1), within_t

    hist, within = lax.scan(step, jnp.zeros((NB,), jnp.int32), cp)
    within = within.reshape(M * K)[:N]
    above = jnp.cumsum(hist[::-1])[::-1] - hist  # counts strictly greater
    rank = jnp.take(above, c) + within
    # permutation: slot rank <- ray index
    return jnp.zeros((N,), jnp.int32).at[rank].set(
        jnp.arange(N, dtype=jnp.int32))

bench("argsort(-counts) stable (current)", srt)
bench("counting rank (one-hot tiles)", counting_rank)

a = np.asarray(jax.jit(srt)(counts))
b = np.asarray(jax.jit(counting_rank)(counts))
assert (a == b).all(), "counting rank must equal stable argsort"
print("permutation bit-equality ok", flush=True)
