"""Size the arithmetic brick-table select bound (_OCC_SELECT_MAX_TERMS).

Measures the packed compare-select vs scattered jnp.take at the brick-table
sizes of real volume classes (96^3 -> 12^3 bricks, 192^3 -> 24^3, 384^3 ->
48^3, bunny-scale -> 73x72x55) at the compact-build's lookup batch size, on
the real chip.  The crossover sets the bound.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_occ_select.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import time

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

    from volumerenderer_tpu.grid import dense as dense_mod

    M = 39_000_000  # the 1080p counts-pass batch (2M rays x 19 endpoints)
    rng = np.random.default_rng(0)

    for shape in [(12, 12, 12), (24, 24, 24), (48, 48, 48), (73, 72, 55)]:
        X, Y, Z = shape
        W = -(-Z // 32)
        terms = X * Y * W
        table = jnp.asarray(rng.random(shape) < 0.3)
        relb = jnp.asarray(
            np.stack([rng.integers(0, X, M), rng.integers(0, Y, M),
                      rng.integers(0, Z, M)], axis=-1), jnp.int32)

        old = dense_mod._OCC_SELECT_MAX_TERMS
        out = {}
        for name, bound in (("select", 10**9), ("take", 0)):
            dense_mod._OCC_SELECT_MAX_TERMS = bound
            try:
                f = jax.jit(lambda t, r: dense_mod._occ_table_lookup(t, r))
                sync(f(table, relb))
                t0 = time.perf_counter()
                for _ in range(3):
                    o = f(table, relb)
                s = sync(o)
                out[name] = (time.perf_counter() - t0) / 3
            finally:
                dense_mod._OCC_SELECT_MAX_TERMS = old
        print(f"bricks {X:3d}x{Y:3d}x{Z:3d} (terms {terms:6d}): "
              f"select {out['select']*1e3:7.1f} ms  "
              f"take {out['take']*1e3:7.1f} ms  "
              f"({out['take']/out['select']:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
