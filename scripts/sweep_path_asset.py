"""Asset-scale PATH (chunk, subblock) sweep with sorted compaction on.

The committed (2048, 32) knee was measured at 256^2 pre-sort; at asset
scale the frame is structure-bound (microbench_path_bounds.py --asset),
so wider chunks (fewer serial while_loop iterations) may move the knee.
"""
from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

T0 = time.perf_counter()
def note(m):
    print(f"[sweep {time.perf_counter()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)
note("claiming TPU terminal...")
_ = float(jnp.zeros((), jnp.float32))
note("claimed")

from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
from volumerenderer_tpu.grid.dense import from_dense

def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))

dense = np.load(os.path.join(os.path.dirname(__file__), os.pardir,
                             ".cache", "asset_vol.npy"))
g = from_dense(dense, bbox_min=(-196, -180, -156), voxel_size=0.125,
               translation=(0.0, 20.0, 20.0))
params = RenderParams.default().replace(
    camera_pos=jnp.float32([0.0, 20.0, -40.0]),
    light_source_world_pos=jnp.float32([-10.0, 28.0, 8.0]))

for chunk, sb in [(2048, 32), (4096, 32), (8192, 32), (4096, 64)]:
    cfg = StaticConfig(width=512, height=512, path_chunk=chunk,
                       path_subblock=sb)
    r = Renderer(g, cfg, params, algorithm=Algorithm.PATH)
    r.step(2); sync(r.state.accum)
    t0 = time.perf_counter()
    r.step(4); sync(r.state.accum)
    dt = (time.perf_counter() - t0) / 4
    print(f"chunk={chunk:5d} sb={sb:3d} {dt*1e3:8.1f} ms/frame  "
          f"checksum {sync(r.state.accum):.6g}", flush=True)
    note(f"done chunk={chunk} sb={sb}")
    del r
