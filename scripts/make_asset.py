"""Production-scale VDB asset pipeline check (VERDICT r1 #6).

Builds a bunny_cloud-class fog volume (tens of millions of voxels, thin
shell + noisy interior), writes it through the INDEPENDENT C++ encoder
(native/vdb_write.cpp, blosc+mask — not tests/vdb_writer.py), reloads it
through the production ingestion path (grid.from_vdb -> native
vdb_read.cpp), verifies the density round-trips exactly, then renders all
5 algorithms at 1080p on the current backend and checks every frame is
finite and non-black.  The reference anchor is src/main.cpp:1157-1215
(bunny_cloud.vdb through OpenVDB -> NanoVDB -> SSBO).

Writes asset_report.json.  Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/make_asset.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_volume(n=(392, 360, 312), seed=42):
    """Bunny-cloud-like fog: union of ellipsoid blobs x fractal noise,
    hollow-ish interior — a thin-shell asset like the reference's."""
    rs = np.random.RandomState(seed)
    nx, ny, nz = n
    x, y, z = np.meshgrid(
        np.linspace(-1, 1, nx), np.linspace(-1, 1, ny),
        np.linspace(-1, 1, nz), indexing="ij",
    )
    # body + head + ears: soft ellipsoids
    d = np.full(x.shape, 1e9, np.float32)

    def ellipsoid(cx, cy, cz, rx, ry, rz):
        return np.sqrt(((x - cx) / rx) ** 2 + ((y - cy) / ry) ** 2
                       + ((z - cz) / rz) ** 2) - 1.0

    for args in [(0, -0.25, 0, 0.62, 0.5, 0.55),
                 (0.05, 0.32, 0.12, 0.34, 0.3, 0.3),
                 (-0.12, 0.72, 0.1, 0.1, 0.32, 0.12),
                 (0.2, 0.74, 0.1, 0.1, 0.34, 0.12)]:
        d = np.minimum(d, ellipsoid(*args))
    # multi-octave value noise for the cloud texture
    noise = np.zeros(x.shape, np.float32)
    for octave in range(3):
        s = 6 * 2 ** octave
        g = rs.rand(s + 1, s + 1, s + 1).astype(np.float32)
        xi = np.clip((x * 0.5 + 0.5) * s, 0, s - 1e-3)
        yi = np.clip((y * 0.5 + 0.5) * s, 0, s - 1e-3)
        zi = np.clip((z * 0.5 + 0.5) * s, 0, s - 1e-3)
        x0, y0, z0 = xi.astype(int), yi.astype(int), zi.astype(int)
        fx, fy, fz = xi - x0, yi - y0, zi - z0
        v = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                         * (fz if dz else 1 - fz))
                    v = v + w * g[x0 + dx, y0 + dy, z0 + dz]
        noise += v.astype(np.float32) / 2 ** octave
    noise /= noise.max()
    shell = np.exp(-np.abs(d) * 6.0) * (d < 0.15)
    dense = (shell * (0.25 + 0.75 * noise)).astype(np.float32)
    dense[dense < 0.02] = 0.0
    return dense


def main() -> int:
    from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
    from volumerenderer_tpu.grid import from_vdb, ingest
    from volumerenderer_tpu.grid.dense import from_dense
    import jax.numpy as jnp

    report = {}
    t0 = time.perf_counter()
    dense = make_volume()
    occupied = int((dense > 0).sum())
    report["voxels"] = int(dense.size)
    report["occupied"] = occupied
    print(f"volume: {dense.shape} = {dense.size/1e6:.0f}M voxels, "
          f"{occupied/1e6:.1f}M occupied ({time.perf_counter()-t0:.0f}s)",
          flush=True)

    # world transform like bunny_cloud: small voxel size, centered
    voxel_size = 0.125
    g0 = from_dense(dense, bbox_min=(-196, -180, -156), voxel_size=voxel_size,
                    translation=(0.0, 20.0, 20.0))

    path = "/tmp/asset_bunny_like.vdb"
    t0 = time.perf_counter()
    ingest.save_vdb(g0, path, compression="blosc+mask")
    report["file_bytes"] = os.path.getsize(path)
    print(f"wrote {path}: {report['file_bytes']/1e6:.1f} MB "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    t0 = time.perf_counter()
    g = from_vdb(path)
    print(f"reload: {time.perf_counter()-t0:.0f}s", flush=True)
    pad = np.asarray(g0.voxels)
    got = np.asarray(g.voxels)
    lo = np.asarray(g.bbox_min) - np.asarray(g0.bbox_min)
    ref = pad[tuple(slice(l, l + s) for l, s in zip(lo, got.shape))]
    if not np.array_equal(got, ref):
        report["roundtrip"] = "MISMATCH"
        print("DENSITY MISMATCH", flush=True)
        return 1
    report["roundtrip"] = "exact"

    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -40.0]),
        light_source_world_pos=jnp.float32([-10.0, 28.0, 8.0]),
    )
    config = StaticConfig(width=1920, height=1080)
    report["renders"] = {}
    ok = True
    for algo in Algorithm:
        t0 = time.perf_counter()
        r = Renderer(g, config, params, algorithm=algo)
        r.step(2)
        img = np.asarray(r.state.accum)
        dt = time.perf_counter() - t0
        finite = bool(np.isfinite(img).all())
        mx = float(img.max())
        report["renders"][algo.name] = {
            "finite": finite, "max": mx, "seconds_2frames_cold": round(dt, 1),
        }
        ok &= finite and mx > 0
        print(f"{algo.name}: finite={finite} max={mx:.4f} ({dt:.0f}s)",
              flush=True)
        del r
    report["pass"] = ok
    with open(os.path.join(REPO, "asset_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report)[:400])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
