"""Beam/VBL closed-form roofline closure (VERDICT r3 next-step #1).

Turns the Beam closed-form frame time at the 1080p bench config into a
quantitative VPU bound in four steps, all on the production kernel — no
synthetic microbenches (Mosaic schedules dependent toy chains at latency,
not throughput, so a separate "peak" kernel measures the wrong thing):

1. PAIR ACCOUNTING — exactly what the lane kernel executes: per
   1024-lane block, ceil(block_max_lane_need / 8) slabs of (8, 1024)
   samples, times the frame's mean live segment count.
2. FIXED-COST SPLIT — the same frame with zero live segments prices
   everything that is not the gather (march/photon/accumulate/display),
   so the gather's own pair rate is exact.
3. IN-SITU ABLATION — recompile the kernel with surgical edits to the
   closed rule (drop the atan polynomial, price sqrt and divide by
   swapping each for a multiply) and measure deltas at identical
   structure; this yields empirical slot costs per op class under the
   real scheduler, register pressure, and loop shape.
4. BOUND — counted ops/pair x measured slot costs -> achieved slot rate,
   compared against the v5e VPU ceiling (8x128 lanes x 4 ALUs x
   0.94 GHz = 3.85 T f32 op-slots/s; TPU v5e spec) and against the
   50 Mrays/s bar's implied budget.

Run on the real chip:
PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_beam_roofline.py
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

V5E_VPU_SLOTS = 8 * 128 * 4 * 0.94e9  # lanes x ALUs x clock = 3.85e12/s
W, H = 1920, 1080
FRAMES = 8


def sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def make_renderer(max_lights=None):
    from volumerenderer_tpu import (
        Algorithm, Renderer, RenderParams, StaticConfig,
    )
    from volumerenderer_tpu.grid import procedural

    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 20.0, -75.0]),
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
    )
    if max_lights is not None:
        params = params.replace(max_lights=max_lights)
    return Renderer(
        procedural.cloud(n=96),
        StaticConfig(width=W, height=H, segment_mode="analytic",
                     beam_quadrature_rule="closed"),
        params, algorithm=Algorithm.BEAM,
    )


def measure(r, label):
    r.step(9)
    sync(r.state.accum)
    t0 = time.perf_counter()
    r.step(FRAMES)
    cs = sync(r.state.accum)
    spf = (time.perf_counter() - t0) / FRAMES
    print(f"  {label:42s} {spf*1e3:7.1f} ms/frame "
          f"({W*H/spf/1e6:6.2f} Mrays/s)  checksum={cs:.1f}", flush=True)
    return spf


def main() -> None:
    print("claiming device...", flush=True)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s "
          f"backend={jax.default_backend()}", flush=True)

    from volumerenderer_tpu.ops.pallas import gather_lanes, gather_vpu
    from volumerenderer_tpu.render.color import CompactView
    from volumerenderer_tpu.render.photon import generate_lights

    # ---- 1. production frame + pair accounting --------------------------
    r = make_renderer()
    spf = measure(r, "production closed exact")
    view = r._view
    assert isinstance(view, CompactView), type(view)
    slab_slots = 0
    for band in view.bands:
        need = np.asarray(band.lane_need)
        Rc = need.shape[0]
        block_max = need.reshape(
            Rc // gather_lanes.TILE_L, gather_lanes.TILE_L
        ).max(axis=1)
        slab_slots += (
            int((-(-block_max // gather_lanes.SLAB)).sum())
            * gather_lanes.SLAB * gather_lanes.TILE_L
        )
    counts = [
        int(generate_lights(r.grid, r.params, jnp.int32(fc), r.config).count)
        for fc in range(int(r.state.frame_count) - FRAMES + 1,
                        int(r.state.frame_count) + 1)
    ]
    n_seg = float(np.mean(counts))
    pairs = slab_slots * n_seg
    print(f"  sample slots (slab-rounded) {slab_slots:,}; live segments "
          f"{counts} (mean {n_seg:.1f}) -> {pairs/1e9:.3f} G pairs/frame")
    del r

    # ---- 2. fixed (non-gather) frame cost --------------------------------
    # max_lights=0 clamps lightCount to 0 (reference semantics): the
    # gather's fori_loop runs zero trips but every other stage is intact.
    r0 = make_renderer(max_lights=0)
    fixed = measure(r0, "same frame, zero live segments")
    del r0
    gather_s = spf - fixed
    rate = pairs / gather_s
    print(f"  gather time {gather_s*1e3:.1f} ms -> {rate/1e9:.2f} G pairs/s",
          flush=True)

    # ---- 3. in-situ ablations --------------------------------------------
    # Each variant swaps one op class inside the closed rule for a multiply
    # of equal data flow (results are WRONG; structure/loop shape is not),
    # so (full - variant) / (#ops removed x pairs) prices that class in
    # slot-seconds under the real scheduler.
    orig = gather_vpu._quad_nodes_nq
    orig_ratio = gather_vpu._atan_pos_ratio

    def patched(sqrt_fn=None, ratio_fn=None, poly=True):
        def q(rule, nodes, d, u, b, ll, radius):
            assert rule == "closed"
            sq = sqrt_fn or jnp.sqrt
            q2 = gather_vpu._cross_q2(d, u)
            qc = jnp.maximum(sq(q2), radius * jnp.float32(1.015625))
            qc2 = qc * qc
            lb = ll - b
            d0 = sq(qc2 + b * b)
            d1 = sq(qc2 + lb * lb)
            p0 = lb * d0
            p1 = b * d1
            den_c = p0 - p1
            conj = (
                qc2 * ll * (ll - 2.0 * b)
                / jnp.where(den_c == 0.0, 1e-30, den_c)
            )
            ds = jnp.where((b >= 0.0) & (b <= ll), p0 + p1, conj)
            sl = qc * ll
            A = (qc - radius) * (qc + radius)
            irA = jax.lax.rsqrt(A) if sqrt_fn is None else sqrt_fn(A)
            kappa = (qc + radius) * irA
            n_r = radius * (ds - radius * ll)
            q_r = (A * qc) * ((d0 - radius) * (d1 - radius))
            numt = kappa * (ds + sl)
            dent = (d0 + qc) * (d1 + qc) - (kappa * kappa) * (b * lb)
            ang = (ratio_fn or orig_ratio)(numt, dent)
            if not poly:
                ang = ang * jnp.float32(0.637)  # drop only the polynomial
            t_term = (2.0 * qc) * (irA * irA * irA) * ang

            def node_nq(j):
                if j == 0:
                    return n_r, q_r
                if j == 1:
                    return t_term, jnp.float32(1.0)
                return jnp.float32(0.0), jnp.float32(1.0)

            return node_nq, qc

        return q

    def mul_sqrt(x):
        return x * jnp.float32(0.7)

    def ratio_no_poly(num, den):
        ad = jnp.abs(den)
        inv = num > ad
        z = jnp.minimum(num, ad) / jnp.maximum(jnp.maximum(num, ad), 1e-30)
        p = jnp.where(inv, jnp.float32(1.5707964) - z, z)
        return jnp.where(den < 0.0, jnp.float32(3.1415927) - p, p)

    def ratio_mul(num, den):
        # divide priced out too (WRONG math; same data flow)
        ad = jnp.abs(den)
        inv = num > ad
        z = jnp.minimum(num, ad) * jnp.maximum(jnp.maximum(num, ad), 1e-30)
        p = jnp.where(inv, jnp.float32(1.5707964) - z, z)
        return jnp.where(den < 0.0, jnp.float32(3.1415927) - p, p)

    variants = [
        ("rebuilt baseline (must match production)", patched()),
        ("atan polynomial -> linear (-9 fma)", patched(ratio_fn=ratio_no_poly)),
        ("4 sqrt/rsqrt -> mul (-4 sqrt)", patched(sqrt_fn=mul_sqrt)),
        ("ratio divide -> mul (-1 div)",
         patched(ratio_fn=ratio_mul)),
    ]
    times = {}
    for label, fn in variants:
        gather_vpu._quad_nodes_nq = fn
        gather_lanes._quad_nodes_nq = fn
        jax.clear_caches()
        rv = make_renderer()
        times[label] = measure(rv, label)
        del rv
    gather_vpu._quad_nodes_nq = orig
    gather_lanes._quad_nodes_nq = orig
    jax.clear_caches()

    base = times[variants[0][0]]

    # ---- 4. bound ---------------------------------------------------------
    # fma slot-second: from the polynomial ablation (9 pure fma ops).
    fma_s = (base - times[variants[1][0]]) / (pairs * 9)
    sqrt_s = (base - times[variants[2][0]]) / (pairs * 4)
    div_s = (base - times[variants[3][0]]) / (pairs * 1)
    n_fma, n_sqrt, n_div = 95, 4, 3
    pred = pairs * (n_fma * fma_s + n_sqrt * sqrt_s + n_div * div_s)
    achieved = n_fma + n_sqrt * (sqrt_s / fma_s) + n_div * (div_s / fma_s)
    slot_rate = achieved * pairs / gather_s
    bar_budget = (
        (W * H / 50e6 - fixed) * slot_rate / pairs
    )
    print(f"\n  counted {n_fma} fma + {n_sqrt} sqrt + {n_div} div per pair")
    print(f"  measured slot-seconds: fma {fma_s*1e12:.3f} ps, sqrt "
          f"{sqrt_s*1e12:.3f} ps ({sqrt_s/fma_s:.1f} fma), div "
          f"{div_s*1e12:.3f} ps ({div_s/fma_s:.1f} fma)")
    print(f"  predicted gather from unit costs: {pred*1e3:.1f} ms vs "
          f"measured {gather_s*1e3:.1f} ms")
    print(f"  achieved {slot_rate/1e12:.2f} T fma-equiv slots/s = "
          f"{slot_rate/V5E_VPU_SLOTS*100:.0f}% of the v5e VPU ceiling "
          f"({V5E_VPU_SLOTS/1e12:.2f} T/s)")
    print(f"  50 Mrays/s bar -> gather budget {(W*H/50e6-fixed)*1e3:.1f} ms "
          f"-> {bar_budget:.0f} fma-equiv slots/pair vs "
          f"{achieved:.0f} needed by the exact antiderivative", flush=True)


if __name__ == "__main__":
    main()
