"""PROBE (retired hypothesis): divide-free PATH light term — perf-neutral.

The reference PATH light term (path_compute_color.comp:9-31) costs, per
(ray, sample) site: a norm (sqrt), THREE guarded per-component divides
for the unit direction, one more divide for the step count, and an exp
of a 4-factor product.  The hypothesis — backed by
probe_walk_chunk_asset.py's "light=const saves 5.3 ms/chunk" delta and
by the divide-elimination wins elsewhere (gather_eval="paired": Point
104 -> 122 Mrays/s) — was that a rsqrt-based divide/sqrt-free
formulation (render.path._light_term_reference_fast) would cut PATH
frame time.

MEASURED RESULT (v5e, 256^2, 96^3 cloud, light inside the cloud body):
35.85 ms/frame exact vs 35.90 fast — NEUTRAL, and the images agree to
rounding level.  Explanation: the walk-chunk probe passed ``lut=None``,
so its light=const delta was dominated by the scattered probe FETCH;
the production frame always has the shadow LUT active (step 1.0 ->
radius 1), which already replaced that fetch with a 27-way in-register
select — the divides/sqrt this formulation removes are a rounding error
of the chunk's cost.  The formulation is kept (tested:
tests/test_path.py::test_path_fast_light_term_probe_is_close) but NOT
wired to any config; this script re-reproduces the measurement by
patching render.path._light_term.
"""
from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

def note(m):
    print(f"[leval {time.perf_counter()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)
T0 = time.perf_counter()
note("claiming TPU terminal...")
_ = float(jnp.zeros((), jnp.float32))
note("claimed")

from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
from volumerenderer_tpu.grid import procedural
from volumerenderer_tpu.render import path as path_mod

def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))

asset = "--asset" in sys.argv
if asset:
    from volumerenderer_tpu.grid.dense import from_dense
    dense = np.load(os.path.join(os.path.dirname(__file__), os.pardir,
                                 ".cache", "asset_vol.npy"))
    g = from_dense(dense, bbox_min=(-196, -180, -156), voxel_size=0.125,
                   translation=(0.0, 20.0, 20.0))
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -40.0]),
        light_source_world_pos=jnp.float32([-10.0, 28.0, 8.0]))
    side, warm, nf = 512, 2, 4
else:
    g = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]))
    side, warm, nf = 256, 8, 32


def fast_light_term(grid, pos, light_local, params, config, lut, n_shadow):
    # The fast probe implements REFERENCE semantics only; fail loudly if a
    # future edit points this script at a CORRECTED-fidelity config, which
    # would silently compare mismatched semantics (ADVICE r3).
    assert config.fidelity is path_mod.Fidelity.REFERENCE, config.fidelity
    return path_mod._light_term_reference_fast(
        grid, pos, light_local, params, lut)


orig = path_mod._light_term
images = {}
for mode in ("exact", "fast"):
    path_mod._light_term = orig if mode == "exact" else fast_light_term
    # Same StaticConfig in both modes -> same jit cache keys: drop every
    # compiled program so the patched body actually retraces.
    jax.clear_caches()
    try:
        cfg = StaticConfig(width=side, height=side)
        r = Renderer(g, cfg, params, algorithm=Algorithm.PATH)
        r.step(warm); sync(r.state.accum)
        t0 = time.perf_counter()
        r.step(nf); sync(r.state.accum)
        dt = (time.perf_counter() - t0) / nf
        images[mode] = np.asarray(r.state.accum)
        print(f"light={mode:5s} {side}^2 {dt*1e3:8.2f} ms/frame  "
              f"checksum {sync(r.state.accum):.6g}", flush=True)
        note(f"done light={mode}")
    finally:
        path_mod._light_term = orig

a, b = images["exact"], images["fast"]
denom = np.maximum(np.abs(a), 1e-6)
print(f"max relative deviation fast vs exact: "
      f"{float(np.max(np.abs(a - b) / denom)):.3g}", flush=True)
