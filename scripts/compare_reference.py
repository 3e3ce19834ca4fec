"""Dual-run SSIM harness for the BASELINE.json north star (SSIM >= 0.99
vs reference renders for all 5 algorithms).

The Vulkan reference app cannot run in this environment, so the committed
stand-in ground truth is the loopy NumPy transcription of its shaders
(tests/reference_impl.py — the same oracle every parity test pins against,
but rendered at 256x256 instead of <=16x16).  When actual reference
renders ARE available (e.g. PNG/NPY dumps from the Vulkan app patched to
this scene), point ``--ref-dir`` at them and the same report drops out.

Usage:
  python scripts/compare_reference.py --regen-oracle   # rebuild tests/oracle/
  python scripts/compare_reference.py                  # render ours, emit SSIM
  python scripts/compare_reference.py --ref-dir DIR    # compare vs external dir

Scene: the goldens scene (tests/test_goldens.py) at 256x256 — procedural
48^3 cloud, light inside the body, reference default parameters otherwise
(src/main.cpp:546-559).  One frame (frame_count=1): progressive
accumulation is an exact average of per-frame renders, so single-frame
SSIM is the sharpest comparison (no averaging to hide differences).

Output: compare_report.json {algo: {ssim, max_abs_err}}, pass = all
SSIM >= 0.99.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

# The oracle is pure NumPy; our renders default to CPU for a
# deterministic no-TPU run, but ``--backend tpu`` (much faster at 256^2 —
# interpret-mode Pallas on CPU is slow) validates the real hardware path.
if "tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from volumerenderer_tpu.engine.params import (  # noqa: E402
    Algorithm,
    RenderParams,
    StaticConfig,
)
from volumerenderer_tpu.grid import procedural  # noqa: E402
from volumerenderer_tpu.utils.ssim import ssim  # noqa: E402

SIZE = 256
ORACLE_DIR = os.path.join(REPO, "tests", "oracle")


def scene(size: int = SIZE):
    """The goldens scene at comparison scale (tests/test_goldens.py:18-31)."""
    g = procedural.cloud(n=48, seed=7, center_world=(0.0, 20.0, 20.0),
                         world_extent=70.0)
    params = RenderParams.default().replace(
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
        scattering_probability=jnp.float32(0.15),
    )
    config = StaticConfig(width=size, height=size, max_events_per_photon=32,
                          light_capacity=512, path_compact_min=64)
    return g, params, config


NAMES = {Algorithm.POINT: "point", Algorithm.SPHERE: "sphere",
         Algorithm.RAY: "ray", Algorithm.BEAM: "beam"}


FRAMES = 8  # progressive frames accumulated on both sides (see below)


def regen_oracle(size: int, frames: int = FRAMES) -> None:
    import reference_impl as ref
    import reference_vec as vec

    g, params, config = scene(size)
    os.makedirs(ORACLE_DIR, exist_ok=True)
    # Accumulate FRAMES progressive frames exactly like the app does
    # (mean of frames 1..N).  Comparing single frames is chaotic: samples
    # can land arbitrarily close to a (sub-)light, where the 1/(4 pi d^2)
    # term's derivative diverges, so ulp-level implementation differences
    # flip isolated pixels by O(1).  Those hot pixels move with each
    # frame's fresh light set, so the accumulated image — the product's
    # actual output — dilutes them ~1/N while systematic differences
    # would persist.  The oracle photon walk is ref.generate_lights (the
    # loopy transcription); gather passes render through reference_vec
    # (validated vs the loopy oracle by tests/test_reference_vec.py);
    # PATH renders through the loopy oracle directly.
    for algo in Algorithm:
        t0 = time.perf_counter()
        acc = np.zeros((size, size), np.float64)
        for fc in range(1, frames + 1):
            if algo is Algorithm.PATH:
                img = ref.render_path(g, params, fc, size, size,
                                      max_segments=config.max_path_segments,
                                      fidelity="reference")
            else:
                events, count = ref.generate_lights(
                    g, params, fc, num_photons=config.num_photons,
                    max_events_per_photon=config.max_events_per_photon,
                )
                img = vec.render_gather(g, params, events, count,
                                        NAMES[algo], size, size)
            acc += img
        img = (acc / frames).astype(np.float32)
        path = os.path.join(ORACLE_DIR, f"{algo.name.lower()}_{size}.npy")
        np.save(path, img)
        print(f"wrote {path}  ({time.perf_counter() - t0:.0f}s, "
              f"{frames} frames, max {img.max():.4f})", flush=True)


TIERS = {
    # BENCHMARKS.md performance tiers (the CLI --fast levels): "default"
    # is bit-parity term order; "paired" the reassociation-only fast
    # mode (+ analytic closed-form segments); "decimated" adds the
    # stride-3 folds (gather_stride / path_stride, PARITY #22/#23).
    "default": {},
    "paired": dict(gather_eval="paired", segment_eval="paired",
                   segment_mode="analytic", beam_quadrature_rule="closed"),
    "decimated": dict(gather_eval="paired", segment_eval="paired",
                      segment_mode="analytic", beam_quadrature_rule="closed",
                      gather_stride=3, path_stride=3),
}


def render_ours(size: int, frames: int = FRAMES,
                tier: str = "default") -> dict[str, np.ndarray]:
    import dataclasses

    from volumerenderer_tpu import Renderer

    g, params, config = scene(size)
    config = dataclasses.replace(config, **TIERS[tier])
    out = {}
    for algo in Algorithm:
        r = Renderer(g, config, params, algorithm=algo)
        r.step(frames)
        out[algo.name.lower()] = np.asarray(r.state.accum)
        print(f"rendered {algo.name} ({tier})", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen-oracle", action="store_true")
    ap.add_argument("--backend", choices=["cpu", "tpu"], default="cpu")
    ap.add_argument("--size", type=int, default=SIZE)
    ap.add_argument("--frames", type=int, default=FRAMES)
    ap.add_argument("--ref-dir", default=ORACLE_DIR,
                    help="directory of {algo}_{size}.npy or {algo}.npy "
                         "reference renders")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "compare_report.json"))
    ap.add_argument("--tiers", action="store_true",
                    help="also report the paired/decimated fast tiers")
    args = ap.parse_args()

    if args.regen_oracle:
        regen_oracle(args.size, args.frames)
        return 0

    report, ok = {}, True
    for tier in (("default",) if not args.tiers else tuple(TIERS)):
        ours = render_ours(args.size, args.frames, tier=tier)
        section = report if tier == "default" else report.setdefault(
            "tiers", {}).setdefault(tier, {})
        for name, img in ours.items():
            for cand in (f"{name}_{args.size}.npy", f"{name}.npy"):
                ref_path = os.path.join(args.ref_dir, cand)
                if os.path.exists(ref_path):
                    break
            else:
                section[name] = {"error": "reference render missing"}
                ok = False
                continue
            want = np.load(ref_path).astype(np.float32)
            s = float(ssim(img, want))
            section[name] = {
                "ssim": round(s, 5),
                "max_abs_err": float(np.abs(img - want).max()),
            }
            # The 0.99 gate is the north star for the DEFAULT (bit-parity)
            # tier; fast tiers are reported at their documented tolerances.
            if tier == "default":
                ok &= s >= 0.99
    report["pass"] = ok
    report["size"] = args.size
    report["frames"] = args.frames
    report["backend"] = jax.default_backend()
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
