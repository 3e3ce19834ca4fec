"""Time ONE _walk_chunk at asset depth (S~620), full 2048-ray trips.

Attributes the asset PATH frame: if the frame's ~1178 ms is K chunk
invocations x this unit cost, the walk structure claim gets numbers.
Variants: march_cell 8 vs 1, light=const, short tmax (early exit).

METHOD: one device sync costs ~26-30 ms on this stack regardless of
work (axon lazy-client D2H fence), so each number is the SLOPE between
REP=8 and REP=40 executions — floor and call overhead cancel.  An
earlier revision divided a single REP=16 run by 16 and over-reported
every unit cost by ~1.6 ms.
"""
from __future__ import annotations
import contextlib, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

T0 = time.perf_counter()
def note(m):
    print(f"[wc {time.perf_counter()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)
note("claiming TPU terminal...")
_ = float(jnp.zeros((), jnp.float32))
note("claimed")

from volumerenderer_tpu import RenderParams, StaticConfig
from volumerenderer_tpu.grid.dense import from_dense
from volumerenderer_tpu.render import path as path_mod
from volumerenderer_tpu.render.color import required_march_steps

def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))

dense = np.load(os.path.join(os.path.dirname(__file__), os.pardir,
                             ".cache", "asset_vol.npy"))
g = from_dense(dense, bbox_min=(-196, -180, -156), voxel_size=0.125,
               translation=(0.0, 20.0, 20.0))
params = RenderParams.default().replace(
    camera_pos=jnp.float32([0.0, 20.0, -40.0]),
    light_source_world_pos=jnp.float32([-10.0, 28.0, 8.0]))
config = StaticConfig(width=512, height=512)
S = required_march_steps(g, float(params.ray_marching_step_size),
                         float(params.ray_max_distance))
light_local = g.world_to_index(params.light_source_world_pos)
print(f"S = {S}", flush=True)

n = 2048
rs = np.random.RandomState(0)
lo = np.asarray([-196, -180, -156], np.float32)
ext = np.asarray([392, 360, 312], np.float32)
o = jnp.asarray(rs.rand(n, 3) * ext + lo, jnp.float32)
dd = rs.randn(n, 3); dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
d = jnp.asarray(dd, jnp.float32)
seed0 = jnp.asarray(rs.randint(0, 2**31, (n, 3)), jnp.uint32)
alive = jnp.ones((n,), bool)
R_LO, R_HI = 8, 40

orig_light = path_mod._light_term

@contextlib.contextmanager
def patched(light=False):
    if light:
        path_mod._light_term = (
            lambda grid, pos, ll, p, c, lut, S: jnp.full(pos.shape[:-1], 0.02))
    try:
        yield
    finally:
        path_mod._light_term = orig_light

def run(label, mc, tmax_v, light=False):
    tmax = jnp.full((n,), tmax_v, jnp.float32)
    with patched(light=light):
        def mk(rep):
            @jax.jit
            def f(o, d, seed0, tmax, alive):
                def body(i, acc):
                    dc, *_ = path_mod._walk_chunk(
                        g, params, config, None, S, light_local,
                        o, d, seed0,
                        i.astype(jnp.uint32) + jnp.zeros((n,), jnp.uint32),
                        tmax, alive, march_cell=mc)
                    return acc + jnp.sum(dc)
                return lax.fori_loop(0, rep, body, jnp.zeros(()))
            sync(f(o, d, seed0, tmax, alive))
            t0 = time.perf_counter()
            sync(f(o, d, seed0, tmax, alive))
            return time.perf_counter() - t0
        lo_t, hi_t = mk(R_LO), mk(R_HI)
        dt = (hi_t - lo_t) / (R_HI - R_LO)
    print(f"{label:34s} {dt*1e3:7.2f} ms/chunk-walk", flush=True)
    note(f"done {label}")

run("full mc=8 tmax=450", 8, 450.0)
run("full mc=1 tmax=450", 1, 450.0)
run("light=const mc=8 tmax=450", 8, 450.0, light=True)
run("full mc=8 tmax=50 (early exit)", 8, 50.0)
