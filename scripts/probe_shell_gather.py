"""Attribute the 145M-voxel shell's steady-state Point frame (137 ms vs
the ~35 ms its pair count predicts from the 96^3 operating point):
(a) zero-light frames price the fixed work (photon walk over the deep
volume + accumulate + dispatch), (b) slab accounting prices lane-block
padding waste, (c) per-band rung/need distribution shows block-skip
efficiency.  Run:
PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_shell_gather.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

W, H = 1920, 1080


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def shell_grid():
    from volumerenderer_tpu.grid.dense import from_dense

    dims = (577, 572, 438)
    ax = [jnp.linspace(-1, 1, n, dtype=jnp.float32) for n in dims]
    x, y, z = ax[0][:, None, None], ax[1][None, :, None], ax[2][None, None, :]
    d = jnp.sqrt((x / 0.62) ** 2 + ((y + 0.2) / 0.55) ** 2
                 + (z / 0.58) ** 2) - 1.0
    noise = jax.image.resize(
        jax.random.uniform(jax.random.PRNGKey(42), (48, 48, 48)),
        dims, "trilinear")
    shell = jnp.exp(-jnp.abs(d) * 8.0) * (d < 0.1) * (0.3 + 0.7 * noise)
    vol = jnp.where(shell < 0.03, 0.0, shell).astype(jnp.float32)
    return from_dense(np.asarray(vol), voxel_size=70.0 / 577,
                      translation=(-35.0, -15.0, -10.0))


def main() -> None:
    print("claiming device...", flush=True)
    _ = float(jnp.zeros((), jnp.float32))
    print("claimed", flush=True)

    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.ops.pallas.gather_lanes import SLAB, TILE_L

    gb = shell_grid()
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )

    def frames(label, max_lights=None, n=8, **cfg):
        p = params if max_lights is None else params.replace(
            max_lights=max_lights)
        r = Renderer(gb, StaticConfig(width=W, height=H, **cfg), p,
                     algorithm=Algorithm.POINT)
        r.step(9)
        sync(r.state.accum)
        t0 = time.perf_counter()
        r.step(n)
        sync(r.state.accum)
        spf = (time.perf_counter() - t0) / n
        print(f"  {label:48s} {spf*1e3:7.1f} ms ({W*H/spf/1e6:6.2f} "
              f"Mrays/s)", flush=True)
        view = r._view
        return spf, view, r

    spf, view, r = frames("shell Point paired", gather_eval="paired")
    live = 0.0
    slab_slots = 0
    for bi, b in enumerate(view.bands):
        need = np.asarray(b.lane_need)
        live += float(need.sum())
        Rc = need.shape[0]
        blocks = need.reshape(Rc // TILE_L, TILE_L)
        bmax = blocks.max(axis=1)
        ss = int((-(-bmax // SLAB)).sum()) * SLAB * TILE_L
        slab_slots += ss
        print(f"  band {bi}: lanes {Rc}, plane C {b.weight.shape[0]}, "
              f"live {need.sum()/1e6:.1f}M, slab slots {ss/1e6:.1f}M, "
              f"block need p50/p95/max "
              f"{np.percentile(bmax, 50):.0f}/{np.percentile(bmax, 95):.0f}"
              f"/{bmax.max()}", flush=True)
    lights = int(r.lights.count)
    print(f"  live {live/1e6:.1f}M, slab-rounded {slab_slots/1e6:.1f}M "
          f"(waste {slab_slots/max(live,1):.2f}x), lights {lights} -> "
          f"{slab_slots*lights/1e9:.2f} G pairs/frame", flush=True)
    del r, view

    frames("shell zero lights (fixed: walk+accum)", max_lights=0,
           gather_eval="paired")
    frames("shell paired + stride-2", gather_eval="paired",
           gather_stride=2)


if __name__ == "__main__":
    main()
