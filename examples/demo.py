"""Render every algorithm of the TPU-native volume renderer to PNGs.

Usage:  python examples/demo.py [--size 512] [--frames 16] [--out /tmp]

Mirrors the reference app's interactive workflow (pick an algorithm,
accumulate, look at the image) headlessly.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax.numpy as jnp
import numpy as np

from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig, grid
from volumerenderer_tpu.io import ppm
from volumerenderer_tpu.render import density


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--out", default="/tmp")
    ap.add_argument("--volume", default="", help=".vdb/.nvdb/.npz path "
                    "(default: procedural cloud)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    g = grid.load(args.volume) if args.volume else grid.procedural.cloud(n=96)
    params = RenderParams.default().replace(
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    config = StaticConfig(width=args.size, height=args.size,
                          gather_samples=48, segment_mode="analytic")

    for algo in Algorithm:
        r = Renderer(g, config, params, algorithm=algo)
        t0 = time.time()
        frames = args.frames if algo is not Algorithm.PATH else min(args.frames, 4)
        r.step(frames)
        img = r.image_u8()
        path = os.path.join(args.out, f"demo_{algo.name.lower()}.png")
        ppm.write_png(path, img)
        print(f"{algo.name:6s} {frames} frames in {time.time()-t0:6.1f}s "
              f"(lights={int(r.lights.count) if r.lights is not None else 0}) -> {path}")

    # CPU_test-equivalent density integral render.
    d = density.render_density(g, width=256, height=256,
                               camera_pos=(0.0, 20.0, -75.0),
                               t_max=300.0, dt=1.0, apply_transform=True)
    path = os.path.join(args.out, "demo_density.png")
    ppm.write_png(path, np.asarray(density.to_grayscale_u8(d)))
    print(f"DENSITY 1 frame -> {path}")


if __name__ == "__main__":
    main()
