"""Asset-scale PATH: cell-skipping cost attribution.

The asset brick table (49x45x39 -> 4410 packed terms) exceeds
_OCC_SELECT_MAX_TERMS, so _select_cells' occupancy lookups fall back to
scattered jnp.take — per chunk that is 2048 rays x ~(S/cell+1) endpoint
lookups BEFORE any density fetch.  Measure the frame with cell skipping
disabled (path_march_cell=1) vs auto (8).
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
    print(f"[pc {time.perf_counter()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)
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

for mc in [0, 1]:
    cfg = StaticConfig(width=512, height=512, path_march_cell=mc)
    r = Renderer(g, cfg, params, algorithm=Algorithm.PATH)
    r.step(2); sync(r.state.accum)
    t0 = time.perf_counter()
    r.step(4); sync(r.state.accum)
    dt = (time.perf_counter() - t0) / 4
    print(f"march_cell={mc} (0=auto8) {dt*1e3:8.1f} ms/frame  "
          f"checksum {sync(r.state.accum):.6g}", flush=True)
    note(f"done mc={mc}")
    del r
