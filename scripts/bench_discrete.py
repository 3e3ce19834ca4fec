"""Measure discrete Ray/Beam steady-state throughput at 1080p, both
segment modes (in-kernel VPU vs expanded MXU), on the current backend."""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
from volumerenderer_tpu.grid import procedural


def bench(algorithm, mode, eval_="paired", frames=8, width=1920, height=1080):
    grid = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    config = StaticConfig(
        width=width, height=height, segment_mode=mode, segment_eval=eval_
    )
    r = Renderer(grid, config, params, algorithm=algorithm)
    r.step(9)
    np.asarray(r.state.accum)
    t0 = time.perf_counter()
    r.step(frames)
    np.asarray(r.state.accum)
    dt = time.perf_counter() - t0
    mrays = width * height * frames / dt / 1e6
    print(
        f"{algorithm.name:6s} {mode:20s} {eval_:7s}"
        f" {dt / frames * 1e3:8.1f} ms/frame {mrays:8.2f} Mrays/s"
    )
    return mrays


if __name__ == "__main__":
    modes = sys.argv[1:] or ["discrete"]
    for mode in modes:
        evals = ("paired", "exact") if mode == "discrete" else ("exact",)
        for eval_ in evals:
            for alg in (Algorithm.RAY, Algorithm.BEAM):
                bench(alg, mode, eval_)
