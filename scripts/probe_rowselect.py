"""Row-element selection variants on top of the z-row gather.

sample_ijk = row gather (fast, full-minor-dim) + in-register ONE-HOT
select.  Is the one-hot the cheap part or a hidden cost?  Variants at
the 96^3 / 16.7M-fetch shape of microbench_fetch.py:

  1. z-row + one-hot where/sum      (current, ~272 Mfetch/s committed)
  2. z-row + jnp.take_along_axis    (XLA gather within rows)
  3. z-row only (no select; floor)  (upper bound for any select)
  4. flat jnp.take                  (the ~109 Mfetch/s r2 wall)

METHOD: slope between REP=4 and REP=12 full passes with iteration-
perturbed indices (defeats LICM; the ~26-30 ms axon D2H sync floor
cancels) — see probe_select_cost.py for the two traps this avoids.
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
    print(f"[rs {time.perf_counter()-T0:6.1f}s] {m}", file=sys.stderr,
          flush=True)
note("claiming TPU terminal...")
_ = float(jnp.zeros((), jnp.float32))
note("claimed")

def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))

N = 96
M = 16 * 1024 * 1024
vol = jnp.asarray(np.random.RandomState(0).rand(N, N, N), jnp.float32)
rows2d = vol.reshape(N * N, N)
idx = jnp.asarray(np.random.RandomState(1).randint(0, N, (M, 3)), jnp.int32)

R_LO, R_HI = 4, 12

def bench(label, f):
    def mk(rep):
        fj = jax.jit(lambda ix: lax.fori_loop(
            0, rep,
            lambda i, acc: acc + jnp.sum(f((ix + i) % N)),
            jnp.zeros(())))
        sync(fj(idx))
        t = time.perf_counter(); sync(fj(idx))
        return time.perf_counter() - t
    lo, hi = mk(R_LO), mk(R_HI)
    dt = (hi - lo) / (R_HI - R_LO)
    print(f"{label:28s} {dt*1e3:8.1f} ms  {M/dt/1e6:7.1f} Mfetch/s",
          flush=True)
    note(f"done {label}")
    return dt

def rowsel_onehot(ix):
    row = ix[:, 0] * N + ix[:, 1]
    rows = jnp.take(rows2d, row, axis=0)
    sel = lax.broadcasted_iota(jnp.int32, rows.shape, 1) == ix[:, 2:3]
    return jnp.sum(jnp.where(sel, rows, 0.0), axis=-1)

def rowsel_taa(ix):
    row = ix[:, 0] * N + ix[:, 1]
    rows = jnp.take(rows2d, row, axis=0)
    return jnp.take_along_axis(rows, ix[:, 2:3], axis=-1)[:, 0]

def rows_only(ix):
    row = ix[:, 0] * N + ix[:, 1]
    rows = jnp.take(rows2d, row, axis=0)
    return jnp.sum(rows, axis=-1)  # keep the gather un-dead-coded

def flat(ix):
    lin = (ix[:, 0] * N + ix[:, 1]) * N + ix[:, 2]
    return jnp.take(vol.reshape(-1), lin)

bench("z-row + one-hot (current)", rowsel_onehot)
bench("z-row + take_along_axis", rowsel_taa)
bench("z-row only (floor)", rows_only)
bench("flat jnp.take", flat)

a = np.asarray(jax.jit(rowsel_onehot)(idx))
b = np.asarray(jax.jit(rowsel_taa)(idx))
c = np.asarray(jax.jit(flat)(idx))
assert (a == b).all() and (a == c).all()
print("bit-equality ok", flush=True)
