"""Measure path_sort_chunks on/off: 256^2 procedural and (--asset) 512^2.

The cost-sorted compaction groups the alive-ray list by a per-ray
block-count bound before chunking, so each chunk's while_loop (which
runs to its slowest ray) wastes less on mixed chunks.  Bit-exact
(tests/test_path.py::test_path_sorted_chunks_are_exact).
"""
from __future__ import annotations
import dataclasses, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

def note(m):
    print(f"[psort {time.perf_counter()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)
T0 = time.perf_counter()
note("claiming TPU terminal...")
_ = float(jnp.zeros((), jnp.float32))
note("claimed")

from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
from volumerenderer_tpu.grid import procedural

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

for sort in (False, True):
    cfg = StaticConfig(width=side, height=side, path_sort_chunks=sort)
    r = Renderer(g, cfg, params, algorithm=Algorithm.PATH)
    r.step(warm); sync(r.state.accum)
    t0 = time.perf_counter()
    r.step(nf); sync(r.state.accum)
    dt = (time.perf_counter() - t0) / nf
    print(f"sort={sort!s:5s} {side}^2 {dt*1e3:8.2f} ms/frame  "
          f"checksum {sync(r.state.accum):.6g}", flush=True)
    note(f"done sort={sort}")
