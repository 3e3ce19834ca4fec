"""Command-line entry point: ``python -m volumerenderer_tpu``.

The reference is launched as a desktop executable that opens a window on
``bunny_cloud.vdb`` (src/main.cpp:1157-1167, 1217-1227).  The TPU build's
equivalent launcher:

  python -m volumerenderer_tpu render [--volume a.vdb] [--algorithm RAY]
      [--size 512] [--frames 16] [--out out.png] [--fast paired]
  python -m volumerenderer_tpu view   [--volume a.vdb] [--size 512]
      [--fast decimated] [--motion coarse]             # interactive window
  python -m volumerenderer_tpu bench                   # tiny self-check

``--volume`` accepts .vdb / .nvdb / .npz (grid.load); without it a
procedural cloud stands in for the reference's bunny asset.
``--fast`` selects the BENCHMARKS.md performance tier: "off" (default)
is reference bit-parity term order; "paired" is the reassociation-only
fast mode (paired divides + the analytic segment integrals, closed-form
Beam rule — PARITY #9/#15); "decimated" adds gather_stride=3 for the
gather algorithms AND path_stride=3 for PATH (the quantified
approximation tier, PARITY #22/#23 — every algorithm's measured 1080p
point clears 50 Mrays/s at SSIM >= 0.99 except PATH, whose tier is its
own quantified point).  ``--motion`` (view only) picks the mid-drag
preview mode (PARITY #18; default "coarse").
"""

from __future__ import annotations

import argparse
import sys
import time


def _enable_compile_cache() -> str:
    """Point JAX's persistent compilation cache at a stable per-user
    location so ``warmup`` pre-compiles survive into later runs and any
    rerun skips the 20-40 s first-compile (VOLUMERENDERER_TPU_CACHE
    overrides; the scripts/bench harnesses use the repo-local
    .jax_cache)."""
    import os

    import jax

    path = os.environ.get(
        "VOLUMERENDERER_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "volumerenderer_tpu", "jax"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def _make_renderer(args, algorithm=None):
    import jax.numpy as jnp

    from . import Algorithm, Renderer, RenderParams, StaticConfig, grid

    g = (grid.load(args.volume) if args.volume
         else grid.procedural.cloud(n=96))
    params = RenderParams.default().replace(
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    cfg = {}
    fast = getattr(args, "fast", "off")
    if fast in ("paired", "decimated"):
        cfg.update(gather_eval="paired", segment_eval="paired",
                   segment_mode="analytic", beam_quadrature_rule="closed")
    if fast == "decimated":
        # The quantified approximation tier: stride-3 folds measured past
        # BOTH halves of the bar for every gather algorithm — Beam (the
        # binding case) 70.8 Mrays/s at SSIM 0.99322 @1080p — and
        # path_stride=3 is PATH's analogue (quality in BENCHMARKS.md).
        cfg.update(gather_stride=3, path_stride=3)
    config = StaticConfig(width=args.size, height=args.size, **cfg)
    algo = Algorithm[args.algorithm] if algorithm is None else algorithm
    return Renderer(g, config, params, algorithm=algo)


def _cmd_render(args) -> int:
    from .io import ppm

    r = _make_renderer(args)
    t0 = time.time()
    r.step(args.frames)
    img = r.image_u8()
    if args.out.endswith(".ppm"):
        ppm.write_ppm(args.out, img)
    else:
        ppm.write_png(args.out, img)
    n = int(r.lights.count) if r.lights is not None else 0
    print(f"{args.algorithm} {args.frames} frames in {time.time()-t0:.1f}s "
          f"(lights={n}) -> {args.out}")
    return 0


def _cmd_view(args) -> int:
    from . import Algorithm
    from .viewer import InteractiveViewer

    r = _make_renderer(args, algorithm=Algorithm[args.algorithm])
    InteractiveViewer(r, motion_mode=args.motion).run()
    return 0


def _cmd_bench(args) -> int:
    from . import Algorithm

    args.algorithm = Algorithm.POINT.name
    args.volume, args.size, args.frames = "", 128, 8
    args.out = "/tmp/volumerenderer_tpu_bench.png"
    return _cmd_render(args)


def _cmd_warmup(args) -> int:
    """Pre-compile the programs a ``view``/``render`` session at this
    configuration will dispatch — uncached first frame, view build,
    cached step, and the frame_batch-batched step — into the persistent
    compilation cache, so a later cold process shows pixels in seconds
    (VERDICT r4 #6: the reference app shows pixels immediately,
    src/main.cpp:1217-1227; XLA's first compile is the TPU-side cost
    this amortizes)."""
    t0 = time.time()
    r = _make_renderer(args)
    r.first_frame_uncached = True  # compile the viewer's TTFF program too
    print(f"[warmup] renderer ready at {time.time()-t0:.1f}s", flush=True)
    r.step(1)  # uncached first-frame program
    float(r.image().max())
    print(f"[warmup] first (uncached) frame at {time.time()-t0:.1f}s",
          flush=True)
    r.step(1)  # view build + cached step
    float(r.image().max())
    print(f"[warmup] view built + cached step at {time.time()-t0:.1f}s",
          flush=True)
    r.step(max(2, r.frame_batch))  # batched dispatch
    float(r.image().max())
    print(f"[warmup] batched step at {time.time()-t0:.1f}s; cache primed",
          flush=True)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m volumerenderer_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("render", _cmd_render), ("view", _cmd_view),
                     ("bench", _cmd_bench), ("warmup", _cmd_warmup)):
        p = sub.add_parser(name)
        p.set_defaults(fn=fn)
        if name != "bench":
            p.add_argument("--volume", default="",
                           help=".vdb/.nvdb/.npz (default: procedural cloud)")
            p.add_argument("--size", type=int, default=512)
            p.add_argument("--algorithm", default="RAY",
                           choices=["BEAM", "RAY", "POINT", "SPHERE", "PATH"])
            p.add_argument("--fast", default="off",
                           choices=["off", "paired", "decimated"],
                           help="performance tier (see BENCHMARKS.md)")
        if name == "render":
            p.add_argument("--frames", type=int, default=16)
            p.add_argument("--out", default="render.png")
        if name == "view":
            p.add_argument("--motion", default="coarse",
                           choices=["off", "coarse", "truncated"],
                           help="mid-drag preview mode (PARITY #18)")
    args = ap.parse_args(argv)
    _enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
