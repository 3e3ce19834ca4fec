"""Full measured-performance matrix for BENCHMARKS.md (run on a QUIET
host: the interactive view rebuild and dispatch round-trips are host-side
and skew badly under CPU contention).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_matrix.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

T0 = time.perf_counter()


def note(msg: str) -> None:
    print(f"[matrix {time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def sync(x) -> float:
    """Force execution with a 4-byte scalar readback.  The axon TPU client
    is lazy (ops journal until the first D2H; jax.block_until_ready returns
    at enqueue), so every timed region must end in a real readback — and a
    scalar one, so transfer time doesn't pollute the measurement."""
    return float(jnp.sum(x.astype(jnp.float32)))


def measure(r, frames, warmup):
    r.step(warmup)
    sync(r.state.accum)
    t0 = time.perf_counter()
    r.step(frames)
    sync(r.state.accum)
    dt = time.perf_counter() - t0
    return r.config.width * r.config.height * frames / dt / 1e6, dt / frames


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    note("claiming TPU terminal (axon pool wait: can be minutes)...")
    t_claim = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    note(f"terminal claimed in {time.perf_counter() - t_claim:.0f}s")

    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.grid import procedural

    g96 = procedural.cloud(n=96)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    rows = []

    def dump():
        """Write the artifact after EVERY row: a transient remote-compile
        failure late in the run must not discard an hour of measurements
        (it did once — the r4 MeshRenderer row)."""
        with open(os.path.join(os.path.dirname(__file__), os.pardir,
                               "bench_matrix.json"), "w") as f:
            json.dump(
                {"backend": jax.default_backend(),
                 "rows": [{"label": l, "ms_per_frame": round(m, 1),
                           "mrays": round(x, 2)} for (l, m, x) in rows]},
                f, indent=2,
            )

    def run(label, algo, w, h, grid=None, frames=32, warmup=9, **cfg):
        r = Renderer(grid if grid is not None else g96,
                     StaticConfig(width=w, height=h, **cfg), params,
                     algorithm=algo)
        mrays, spf = measure(r, frames, warmup)
        rows.append((label, spf * 1e3, mrays))
        dump()
        print(f"{label:55s} {spf*1e3:8.1f} ms {mrays:8.2f} Mrays/s",
              flush=True)
        note(f"done: {label}")
        del r

    A = Algorithm
    run("Point/VPL 1920x1080 gather paired (headline, fast mode)", A.POINT,
        1920, 1080, gather_eval="paired")
    run("Point/VPL 1920x1080 gather exact (bit-parity, default)", A.POINT,
        1920, 1080)
    run("Point/VPL 1280x720 gather paired", A.POINT, 1280, 720,
        gather_eval="paired")
    run("Sphere/VSL 1280x720 gather paired (fast mode)", A.SPHERE, 1280,
        720, gather_eval="paired")
    run("Sphere/VSL 1280x720 gather exact (bit-parity, default)", A.SPHERE,
        1280, 720)
    run("Sphere/VSL 1920x1080 gather paired (fast mode)", A.SPHERE, 1920,
        1080, gather_eval="paired")
    run("Sphere/VSL 1920x1080 gather exact (bit-parity, default)", A.SPHERE,
        1920, 1080, frames=16)
    run("Ray/VRL 1920x1080 discrete paired (fast mode)", A.RAY, 1920, 1080,
        frames=16, segment_eval="paired")
    run("Ray/VRL 1920x1080 discrete exact (bit-parity, default)", A.RAY,
        1920, 1080, frames=8)
    run("Ray/VRL 1920x1080 analytic", A.RAY, 1920, 1080, frames=16,
        segment_mode="analytic")
    run("Ray/VRL 1920x1080 analytic paired (cross-segment)", A.RAY, 1920,
        1080, frames=16, segment_mode="analytic", segment_eval="paired")
    run("Beam/VBL 1920x1080 discrete paired (fast mode)", A.BEAM, 1920,
        1080, frames=8, segment_eval="paired")
    run("Beam/VBL 1920x1080 analytic (16-node quadrature)", A.BEAM, 1920,
        1080, frames=8, segment_mode="analytic")
    run("Beam/VBL 1920x1080 analytic paired (16-node midpoint)", A.BEAM,
        1920, 1080, frames=8, segment_mode="analytic",
        segment_eval="paired")
    run("Beam/VBL 1920x1080 analytic paired (tangent-8)",
        A.BEAM, 1920, 1080, frames=8, segment_mode="analytic",
        segment_eval="paired", beam_quadrature_rule="tangent",
        beam_quadrature_nodes=8)
    run("Beam/VBL 1920x1080 analytic closed-form, exact divides",
        A.BEAM, 1920, 1080, frames=8, segment_mode="analytic",
        beam_quadrature_rule="closed")
    run("Beam/VBL 1920x1080 analytic paired closed-form (fast mode)",
        A.BEAM, 1920, 1080, frames=8, segment_mode="analytic",
        segment_eval="paired", beam_quadrature_rule="closed")
    run("Beam/VBL 1920x1080 analytic tangent-8, exact node divides",
        A.BEAM, 1920, 1080, frames=8, segment_mode="analytic",
        beam_quadrature_rule="tangent", beam_quadrature_nodes=8)
    run("Beam/VBL 1920x1080 analytic paired tangent-4 (aggressive)",
        A.BEAM, 1920, 1080, frames=8, segment_mode="analytic",
        segment_eval="paired", beam_quadrature_rule="tangent",
        beam_quadrature_nodes=4)
    # Decimated gather tier (gather_stride=2, PARITY #22): quality
    # quantified in BENCHMARKS.md (scripts/probe_stride_error.py).
    run("Point/VPL 1920x1080 paired + stride-2 (decimated tier)", A.POINT,
        1920, 1080, gather_eval="paired", gather_stride=2)
    run("Sphere/VSL 1920x1080 paired + stride-2 (decimated tier)",
        A.SPHERE, 1920, 1080, gather_eval="paired", gather_stride=2)
    run("Ray/VRL 1920x1080 analytic paired + stride-2 (decimated tier)",
        A.RAY, 1920, 1080, frames=16, segment_mode="analytic",
        segment_eval="paired", gather_stride=2)
    run("Beam/VBL 1920x1080 closed paired + stride-2 (decimated tier)",
        A.BEAM, 1920, 1080, frames=8, segment_mode="analytic",
        segment_eval="paired", beam_quadrature_rule="closed",
        gather_stride=2)

    run("Path 256x256 (cached camera segment)", A.PATH, 256, 256, frames=16)
    run("Path 1024x1024 (reference window scale)", A.PATH, 1024, 1024,
        frames=4, warmup=3)
    run("Path 1920x1080 (bar resolution)", A.PATH, 1920, 1080,
        frames=4, warmup=3)
    run("Path 1920x1080 path_stride=3 (decimated tier)", A.PATH, 1920,
        1080, frames=8, warmup=3, path_stride=3)

    # PATH 1080p fast operating point: frame batching wins ~25% at this
    # scale (scripts/probe_path_1080p.py; retired at 256^2 where it loses
    # ~12% — the default stays 1).
    r = Renderer(g96, StaticConfig(width=1920, height=1080), params,
                 algorithm=A.PATH)
    r.path_frame_batch = 4
    mrays, spf = measure(r, 8, 4)
    label = "Path 1920x1080 (frame_batch=4, fast)"
    rows.append((label, spf * 1e3, mrays))
    dump()
    print(f"{label:55s} {spf*1e3:8.1f} ms {mrays:8.2f} Mrays/s", flush=True)
    note(f"done: {label}")
    del r

    g384 = procedural.cloud(n=384)
    run("Point/VPL 1280x720 on 384^3 (57M voxels)", A.POINT, 1280, 720,
        grid=g384, frames=16)
    del g384

    # bunny_cloud-scale stress (577x572x438 = 145M voxels): a THIN-SHELL
    # volume like the real bunny_cloud (big empty interior), built on
    # device (ellipsoid SDF shell x low-res noise upsampled with
    # jax.image.resize).
    from volumerenderer_tpu.grid.dense import from_dense

    dims = (577, 572, 438)
    ax = [jnp.linspace(-1, 1, n, dtype=jnp.float32) for n in dims]
    x = ax[0][:, None, None]
    y = ax[1][None, :, None]
    z = ax[2][None, None, :]
    d = jnp.sqrt((x / 0.62) ** 2 + ((y + 0.2) / 0.55) ** 2
                 + (z / 0.58) ** 2) - 1.0
    key = jax.random.PRNGKey(42)
    noise = jax.image.resize(jax.random.uniform(key, (48, 48, 48)),
                             dims, "trilinear")
    shell = jnp.exp(-jnp.abs(d) * 8.0) * (d < 0.1) * (0.3 + 0.7 * noise)
    vol = jnp.where(shell < 0.03, 0.0, shell).astype(jnp.float32)
    gb = from_dense(np.asarray(vol), voxel_size=70.0 / 577,
                    translation=(-35.0, -15.0, -10.0))
    occ = float(jnp.mean((vol > 0).astype(jnp.float32)))
    del vol, shell, noise, d
    print(f"bunny-scale shell occupancy: {occ*100:.1f}%", flush=True)
    run("Point/VPL 1920x1080 on bunny-scale thin shell (145M voxels)",
        A.POINT, 1920, 1080, grid=gb, frames=16)
    run("Point/VPL 1920x1080 bunny-scale shell paired + stride-2",
        A.POINT, 1920, 1080, grid=gb, frames=16, gather_eval="paired",
        gather_stride=2)
    del gb

    # Moving camera at the headline config: (a) default exact mode — the
    # full device-side view rebuild every frame; (b) the opt-in interactive
    # motion modes (StaticConfig.motion_mode, PARITY.md #18).
    def run_moving(label, **cfg):
        r = Renderer(g96, StaticConfig(width=1920, height=1080, **cfg),
                     params, algorithm=A.POINT)
        for fov in (44.9, 45.0):  # warm both parameter points
            r.set(fov=fov)
            r.step(1)
        sync(r.state.accum)
        t0 = time.perf_counter()
        n_moving = 4
        for i in range(n_moving):
            r.set(fov=44.9 if i % 2 == 0 else 45.0)
            r.step(1)
        sync(r.state.accum)
        dt = (time.perf_counter() - t0) / n_moving
        rows.append((label, dt * 1e3, 1920 * 1080 / dt / 1e6))
        dump()
        print(f"{label:55s} {dt*1e3:8.1f} ms "
              f"{1920*1080/dt/1e6:8.2f} Mrays/s", flush=True)
        note(f"done: {label}")
        del r

    run_moving("Point/VPL 1080p moving camera (exact rebuild, default)")
    run_moving("Point/VPL 1080p moving camera (motion_mode=coarse)",
               motion_mode="coarse")
    run_moving("Point/VPL 1080p moving camera (motion_mode=truncated)",
               motion_mode="truncated")

    # Settle frame: one camera edit followed by one frame — the exact
    # rung-capped view rebuild plus the first shaded frame (what a user
    # pays when a drag stops).
    r = Renderer(g96, StaticConfig(width=1920, height=1080), params,
                 algorithm=A.POINT)
    for fov in (44.9, 45.0):  # warm both parameter points
        r.set(fov=fov)
        r.step(1)
    sync(r.state.accum)
    settles = []
    for fov in (44.9, 45.0, 44.9):
        r.set(fov=fov)
        t0 = time.perf_counter()
        r.step(1)
        sync(r.state.accum)
        settles.append(time.perf_counter() - t0)
    label = "Point/VPL 1080p settle frame (exact rebuild + shade)"
    spf = float(np.median(settles))
    rows.append((label, spf * 1e3, 1920 * 1080 / spf / 1e6))
    dump()
    print(f"{label:55s} {spf*1e3:8.1f} ms "
          f"(min {min(settles)*1e3:.0f} / max {max(settles)*1e3:.0f})",
          flush=True)
    note(f"done: {label}")
    del r

    # Progressive settle (StaticConfig.settle_chunks, coarse motion): the
    # exact rebuild runs one row chunk per tick with coarse frames between
    # — the MAX per-tick wall time is the user-perceived hitch, vs the
    # blocking settle frame above.
    r = Renderer(g96, StaticConfig(width=1920, height=1080,
                                   motion_mode="coarse"), params,
                 algorithm=A.POINT)
    K = int(r.config.settle_chunks)
    for fov in (44.9, 45.0):  # warm drag + a full settle cycle each
        r.set(fov=fov)
        r.step(1)
        for _ in range(K + 1):
            r.step(1)
        sync(r.state.accum)
    r.set(fov=44.9)
    r.step(1)
    sync(r.state.accum)  # drag frame; settle starts next tick
    gaps = []
    for _ in range(K + 1):
        t0 = time.perf_counter()
        r.step(1)
        sync(r.state.accum)
        gaps.append(time.perf_counter() - t0)
    assert r.view_exact, "settle did not land exact within K+1 ticks"
    label = (f"Point/VPL 1080p progressive settle (max tick, "
             f"settle_chunks={K})")
    spf = max(gaps)
    rows.append((label, spf * 1e3, 1920 * 1080 / spf / 1e6))
    dump()
    print(f"{label:55s} {spf*1e3:8.1f} ms (ticks: "
          + " ".join(f"{g_*1e3:.0f}" for g_ in gaps) + ")", flush=True)
    note(f"done: {label}")
    del r

    # Multi-chip parity (VERDICT r2 #6): MeshRenderer on a 1-device TPU
    # mesh must track the single-chip Renderer.  One throwaway timed
    # round first — the axon lazy client defers build/teardown work into
    # the first post-warmup round (measured 52 -> 21 ms/frame).
    from jax.sharding import Mesh
    from volumerenderer_tpu.parallel.sharding import MeshRenderer

    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    for attempt in range(3):
        try:
            mr = MeshRenderer(g96, mesh,
                              StaticConfig(width=1920, height=1080,
                                           gather_eval="paired"),
                              params, A.POINT)
            mrays, spf = measure(mr, 32, 8)  # throwaway (deferred lazy)
            break
        except Exception as e:  # transient remote-compile hiccups
            note(f"MeshRenderer attempt {attempt} failed: {e}")
            if attempt == 2:
                raise
            time.sleep(20)
    mrays, spf = measure(mr, 32, 0)
    label = "Point/VPL 1080p MeshRenderer paired (1-device TPU mesh)"
    rows.append((label, spf * 1e3, mrays))
    dump()
    print(f"{label:55s} {spf*1e3:8.1f} ms {mrays:8.2f} Mrays/s", flush=True)
    note(f"done: {label}")
    del mr

    dump()


if __name__ == "__main__":
    main()
