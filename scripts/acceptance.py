"""BASELINE.json acceptance runner.

Renders every acceptance config on the current backend and writes a JSON
report (throughput + image statistics).  The five configs mirror
BASELINE.json:

  1. 256x256 path-traced single frame (CPU_test workload class)
  2. Point/VPL @720p, >=256-light capacity
  3. Sphere/VSL @720p
  4. Ray/VRL @1080p
  5. Beam/VBL @1080p progressive with accumulation reset on parameter change

Usage: PYTHONPATH=. python scripts/acceptance.py [--out acceptance_report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def run() -> dict:
    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.grid import procedural

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # Claim the axon pooled terminal up front (a multi-minute wait that
    # must not land inside any timed region), and end every timed region
    # with a 4-byte scalar readback — bulk image transfers over the
    # tunnel cost 100s of ms and would pollute ms_per_frame.
    _ = float(jnp.zeros((), jnp.float32))

    g = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    report = {"backend": jax.default_backend(), "configs": {}}

    def measure(name, algo, w, h, frames=8, warmup=9, **cfg_kw):
        config = StaticConfig(width=w, height=h, gather_samples=48, **cfg_kw)
        r = Renderer(g, config, params, algorithm=algo)
        r.step(warmup)
        float(jnp.sum(r.state.accum))
        t0 = time.perf_counter()
        r.step(frames)
        float(jnp.sum(r.state.accum))  # scalar fence, not a bulk copy
        dt = (time.perf_counter() - t0) / frames
        img = np.asarray(r.state.accum)
        report["configs"][name] = {
            "algorithm": algo.name,
            "resolution": f"{w}x{h}",
            "ms_per_frame": round(dt * 1e3, 2),
            "mrays_per_sec": round(w * h / dt / 1e6, 2),
            "lights": int(r.lights.count) if r.lights is not None else 0,
            "image_mean": float(img.mean()),
            "image_max": float(img.max()),
            "finite": bool(np.isfinite(img).all()),
        }
        return r

    # 1. Path-traced single frame at the CPU_test scale.
    cfg = StaticConfig(width=256, height=256)
    r = Renderer(g, cfg, params, algorithm=Algorithm.PATH)
    t0 = time.perf_counter()
    r.step()
    float(jnp.sum(r.state.accum))
    dt_first = time.perf_counter() - t0
    img = np.asarray(r.state.accum)
    report["configs"]["path_256"] = {
        "algorithm": "PATH",
        "resolution": "256x256",
        "s_per_frame_incl_compile": round(dt_first, 2),
        "image_mean": float(img.mean()),
        "finite": bool(np.isfinite(img).all()),
    }

    # 2-4.
    measure("point_720p", Algorithm.POINT, 1280, 720)
    measure("sphere_720p", Algorithm.SPHERE, 1280, 720)
    measure("ray_1080p", Algorithm.RAY, 1920, 1080)
    measure("beam_1080p", Algorithm.BEAM, 1920, 1080)
    measure("ray_1080p_analytic", Algorithm.RAY, 1920, 1080,
            segment_mode="analytic")

    # 5. Beam @1080p progressive + accumulation reset on parameter change.
    r = measure("beam_1080p_analytic", Algorithm.BEAM, 1920, 1080,
                segment_mode="analytic")
    fc_before = int(r.state.frame_count)
    r.set(absorption_coefficient=0.06)  # slider: no reset
    assert int(r.state.frame_count) == fc_before
    r.refresh()  # Refresh: reset
    r.step()
    report["configs"]["beam_1080p_analytic"]["accumulation_reset_ok"] = (
        int(r.state.frame_count) == 1
    )

    # 6. On-TPU bit-equality of the in-kernel discrete segment gather vs the
    # expansion + VPU pipeline (PARITY.md #11/#12): the default Ray/Beam
    # parity mode must reproduce the reference's sub-light sum exactly.
    if jax.default_backend() == "tpu":
        report["discrete_kernel_bitequal"] = _check_discrete_bitequal()
    return report


def _check_discrete_bitequal() -> dict:
    from volumerenderer_tpu.ops import lights as L
    from volumerenderer_tpu.ops.gather import (
        gather_planes, gather_segments_discrete,
    )

    rs = np.random.RandomState(31)
    px = jnp.asarray((rs.randn(64, 32) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(64, 32) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(64, 32) * 8 + 15).astype(np.float32))
    w = jnp.asarray((rs.rand(64, 32) > 0.2).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(8, 3) * 8 + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(8, 3) * 8 + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(8) * 30).astype(np.float32))
    valid = jnp.arange(8) < 6
    out = {}
    for name, radius in (("ray", None), ("beam", 0.2)):
        pts, ints, vmask = L.expand_segments(
            pos_from, pos_to, inten, valid, 0.4, 512)
        cpos, cint, cvalid, _ = L.compact_valid(pts, ints, vmask, 2048)
        want = gather_planes(
            px, py, pz, w, cpos, cint, cvalid,
            sphere=radius is not None,
            radius=0.0 if radius is None else radius, impl="vpu")
        got = gather_segments_discrete(
            px, py, pz, w, pos_from, pos_to, inten, valid, 0.4,
            sphere_radius=radius, impl="vpu")
        out[name] = bool((np.asarray(got) == np.asarray(want)).all())
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="acceptance_report.json")
    args = ap.parse_args()
    rep = run()
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=2)
    print(json.dumps(rep, indent=2))
