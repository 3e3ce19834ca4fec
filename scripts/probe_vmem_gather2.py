"""Shape ladder for Mosaic's tpu.dynamic_gather (take-along-axis) lowering.

probe_vmem_gather.py showed the same-shape form passes the Pallas lowering
rule but crashes the backend compiler at (9216, 96).  This ladder maps the
actual envelope: which (rows, lanes, axis) combinations compile and run,
and at what fetch rate, so the volume-fetch formulation can target a
supported shape.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_vmem_gather2.py
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


def probe(R, L, axis, steps=64):
    """take_along_axis gather of a (R, L) block along `axis`, indices
    broadcast from a per-output-row (axis=1: per-row scalar? no —
    general per-element indices here, fully random)."""
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((R, L), np.float32))
    idx = jnp.asarray(rng.integers(0, R if axis == 0 else L, (R, L)),
                      jnp.int32)

    def kern(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=axis)

    f = jax.jit(lambda t, i: pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((R, L), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, L), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R * steps, L), jnp.float32),
    )(t, i))

    try:
        out = f(table, idx)
        got = np.asarray(out[:R])
        want = np.take_along_axis(np.asarray(table), np.asarray(idx), axis)
        ok = np.array_equal(got, want)
        sync(f(table, idx))
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = f(table, idx)
        sync(out)
        dt = (time.perf_counter() - t0) / n
        rate = R * L * steps / dt / 1e6
        print(f"({R:6d},{L:5d}) axis={axis}  OK exact={ok}"
              f"  {dt * 1e3:7.2f} ms  {rate:8.0f} Mfetch/s", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:110]
        print(f"({R:6d},{L:5d}) axis={axis}  FAIL {type(e).__name__}: {msg}",
              flush=True)
        return False


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    t0 = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"terminal claimed in {time.perf_counter() - t0:.0f}s", flush=True)

    cases = [
        (8, 128, 1),      # one vreg, lane gather
        (8, 128, 0),      # one vreg, sublane gather
        (256, 128, 1),    # many sublanes, lane gather
        (256, 128, 0),    # sublane gather across vregs?
        (8, 1024, 1),     # lane gather across lane tiles?
        (1024, 128, 0),
        (9216, 128, 0),   # the volume-as-rows target (lane-padded)
        (128, 9216, 1),   # transposed target
    ]
    for R, L, axis in cases:
        probe(R, L, axis)


if __name__ == "__main__":
    main()
