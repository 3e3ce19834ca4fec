"""Time-to-first-frame measurement (VERDICT r4 #6): cold vs warm
compilation cache, build-first vs the viewer's first_frame_uncached TTFF
path, at the CLI view default (512^2 RAY) and the 1080p bench config
(POINT).

Each cell runs in a FRESH subprocess with its own compilation-cache dir:
"cold" starts from an empty cache (the true first-ever-run cost), "warm"
re-runs against the cache the cold run just filled (any later process,
e.g. after `python -m volumerenderer_tpu warmup`).  TTFF = process start
-> first frame's pixels read back on the host.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_startup.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
T0 = time.perf_counter()
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
_ = float(jnp.zeros((), jnp.float32))  # claim the device
t_claim = time.perf_counter() - T0
from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
from volumerenderer_tpu.grid import procedural
size, algo, ttff_mode = int(sys.argv[2]), sys.argv[3], sys.argv[4]
g = procedural.cloud(n=96)
params = RenderParams.default().replace(
    light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]))
W, H = (1920, 1080) if size == 0 else (size, size)
r = Renderer(g, StaticConfig(width=W, height=H), params,
             algorithm=Algorithm[algo])
r.first_frame_uncached = ttff_mode == "uncached"
r.step(1)
_ = float(r.image().max())  # force pixels to the host
t_first = time.perf_counter() - T0
r.step(2)
_ = float(r.image().max())
t_steady = time.perf_counter() - T0
print(f"RESULT {t_claim:.1f} {t_first:.1f} {t_steady:.1f}", flush=True)
"""


def run_cell(cache: str, size: int, algo: str, mode: str) -> tuple:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"/root/.axon_site:{REPO}"
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", CHILD, cache, str(size), algo, mode],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    wall = time.perf_counter() - t0
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            claim, first, steady = map(float, line.split()[1:])
            return claim, first, steady, wall
    print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
    raise RuntimeError("child produced no RESULT")


def main() -> None:
    results = {}
    for label, size, algo in (("view 512^2 RAY", 512, "RAY"),
                              ("bench 1080p POINT", 0, "POINT")):
        cache = tempfile.mkdtemp(prefix="vrt_startup_cache_")
        try:
            for mode in ("build", "uncached"):
                cold = run_cell(cache + "_" + mode, size, algo, mode)
                warm = run_cell(cache + "_" + mode, size, algo, mode)
                key = f"{label} / {mode}"
                results[key] = {
                    "cold": {"claim_s": cold[0], "first_frame_s": cold[1],
                             "steady_s": cold[2]},
                    "warm": {"claim_s": warm[0], "first_frame_s": warm[1],
                             "steady_s": warm[2]},
                }
                print(f"  {key:34s} cold TTFF {cold[1]:6.1f}s "
                      f"(claim {cold[0]:4.1f}) steady {cold[2]:6.1f}s | "
                      f"warm TTFF {warm[1]:6.1f}s steady {warm[2]:6.1f}s",
                      flush=True)
                shutil.rmtree(cache + "_" + mode, ignore_errors=True)
        finally:
            shutil.rmtree(cache, ignore_errors=True)
    with open(os.path.join(REPO, "startup_report.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("wrote startup_report.json", flush=True)


if __name__ == "__main__":
    main()
