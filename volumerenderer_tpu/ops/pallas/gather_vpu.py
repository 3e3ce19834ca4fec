"""Small-light-count radiance gather — per-light VPU kernel.

The MXU kernel (gather_kernel.py) wins when thousands of light slots are
populated (expanded Ray/Beam segments).  But the reference's default
workload has ~10-100 virtual lights per frame (16 photons x a few scatter
events, src/main.cpp:814), where the dominant costs are layout padding and
per-block overheads, not FLOPs.  This kernel is shaped for that regime:

  * Samples live as three (M, 128) coordinate planes — the natural f32
    (8, 128) tiling with zero padding waste, produced by plain reshapes
    (no transposes/relayouts).
  * Lights sit in SMEM; an inner fori_loop with a *dynamic* trip count
    walks exactly the [start, start+count) contiguous valid range — cost
    scales with the true light count at per-light granularity.
  * Sample blocks whose gather weights are all zero (rays that missed the
    volume, padding) are skipped via a per-block flag — typically the large
    majority of an image.

d^2 is computed elementwise (3 sub, 3 mul-add) — exact, no matmul
cancellation; the 1/(4 pi d^2) epilogue matches common_functions.h:186-201.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lights import FOUR_PI, GUARD

TILE_M = 512  # sublane rows per block -> 512*128 = 65536 samples/block
SMEM_LIGHT_LIMIT = 2048  # beyond this, use the MXU kernel


def _kernel(meta_ref, rad_ref, lx_ref, ly_ref, lz_ref, li_ref, active_ref,
            px_ref, py_ref, pz_ref, w_ref, o_ref, *, sphere: bool,
            paired: bool):
    # Light columns arrive as separate 1-D SMEM arrays: 2-D SMEM windows are
    # lane-padded 32x on TPU (an f32[2048,4] window allocates 1 MB of the
    # 1 MB SMEM budget); 1-D windows are packed tight.
    #
    # ``paired=True``: one divide per 4 lights via a rational combination
    # with per-term numerators (guarded/overrun terms (n=0, q=1) contribute
    # exactly zero) — see gather_lanes._point_kernel for the derivation and
    # the measured <= 3e-5 relative reassociation error.
    i = pl.program_id(0)

    @pl.when(active_ref[i] == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(active_ref[i] != 0)
    def _():
        start = meta_ref[0]
        count = meta_ref[1]
        radius = rad_ref[0]
        L = lx_ref.shape[0]
        px, py, pz = px_ref[:], py_ref[:], pz_ref[:]

        def d2e_bad(kc):
            dx = px - lx_ref[kc]
            dy = py - ly_ref[kc]
            dz = pz - lz_ref[kc]
            d2 = dx * dx + dy * dy + dz * dz
            if sphere:
                dist = jnp.sqrt(d2)
                dd = dist - radius
                d2e = dd * dd
                bad = (d2e < GUARD) | (dist == 0.0)
            else:
                d2e = d2
                bad = d2e < GUARD
            return d2e, bad

        if paired:
            def nq(k):
                kc = jnp.minimum(k, L - 1)
                d2e, bad = d2e_bad(kc)
                bad = bad | (k >= start + count)
                return (
                    jnp.where(bad, 0.0, li_ref[kc]),
                    jnp.where(bad, 1.0, d2e),
                )

            def group(g, acc):
                k0 = start + g * 4
                n1, q1 = nq(k0)
                n2, q2 = nq(k0 + 1)
                n3, q3 = nq(k0 + 2)
                n4, q4 = nq(k0 + 3)
                q12 = q1 * q2
                q34 = q3 * q4
                n12 = n1 * q2 + n2 * q1
                n34 = n3 * q4 + n4 * q3
                return acc + (n12 * q34 + n34 * q12) / (q12 * q34)

            o_ref[:] = w_ref[:] * jax.lax.fori_loop(
                0, (count + 3) // 4, group, jnp.zeros_like(o_ref)
            )
            return

        def light(k, acc):
            ii = li_ref[k]  # intensity / (4 pi)
            d2e, bad = d2e_bad(k)
            return acc + jnp.where(bad, 0.0, ii / jnp.maximum(d2e, GUARD))

        o_ref[:] = w_ref[:] * jax.lax.fori_loop(
            start, start + count, light, jnp.zeros_like(o_ref)
        )


def _atan(x):
    """Polynomial atan for the VPU (Mosaic has no atan primitive).

    Range-reduced odd minimax polynomial on [0, 1]; |err| < 2e-5 rad —
    far below the integral's discretization-limit interpretation.
    """
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1e-30), ax)
    z2 = z * z
    p = z * (
        0.9998660
        + z2
        * (-0.3302995 + z2 * (0.1801410 + z2 * (-0.0851330 + z2 * 0.0208351)))
    )
    p = jnp.where(inv, jnp.float32(1.5707963267948966) - p, p)
    return jnp.where(x < 0.0, -p, p)


def _segment_sphere_kernel(meta_ref, rad_ref, ax_ref, ay_ref, az_ref,
                           ux_ref, uy_ref, uz_ref, ll_ref, ii_ref,
                           active_ref, px_ref, py_ref, pz_ref, w_ref, o_ref,
                           *, nodes: int, paired: bool = False):
    """Quadrature VBL: midpoint rule over each segment's sphere-light
    integrand 1/(4 pi (d(s) - r)^2) with a FIXED node count, instead of the
    reference's len/lightRayStepSize sub-lights (beam_compute_color.comp:
    11-24 + getSphereLightContribution).  Both are quadratures of the same
    integral; ``nodes`` trades accuracy for speed (default 16 ~ 8-30x fewer
    terms).  d^2(s) = s^2 - 2 b s + c is evaluated per node from the
    per-segment (b, c) — 2 ops — so each node costs ~7 VPU ops.

    ``paired=True``: one divide per 4 nodes via the rational combination of
    gather_lanes._point_kernel (guarded nodes (n=0, q=1) contribute exactly
    zero) — reassociation-only deviation on an already-approximate mode.

    Segment columns as 1-D SMEM arrays: ax, ay, az, ux, uy, uz, L,
    I/(4 pi L).
    """
    i = pl.program_id(0)

    @pl.when(active_ref[i] == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(active_ref[i] != 0)
    def _():
        start = meta_ref[0]
        count = meta_ref[1]
        radius = rad_ref[0]
        px, py, pz = px_ref[:], py_ref[:], pz_ref[:]

        def seg(k, acc):
            ax = ax_ref[k]
            ay = ay_ref[k]
            az = az_ref[k]
            ux = ux_ref[k]
            uy = uy_ref[k]
            uz = uz_ref[k]
            ll = ll_ref[k]
            ii = ii_ref[k]
            dx = px - ax
            dy = py - ay
            dz = pz - az
            b = dx * ux + dy * uy + dz * uz
            c = dx * dx + dy * dy + dz * dz

            def node_d2e_bad(j):
                s = (j + 0.5) / nodes * ll
                d2 = jnp.maximum(c - 2.0 * b * s + s * s, 0.0)
                d = jnp.sqrt(d2)
                dd = d - radius
                d2e = dd * dd
                bad = (d2e < GUARD) | (d == 0.0)
                return d2e, bad

            total = jnp.zeros_like(acc)
            if paired:
                def node_nq(j):
                    if j >= nodes:
                        return jnp.float32(0.0), jnp.float32(1.0)
                    d2e, bad = node_d2e_bad(j)
                    return (
                        jnp.where(bad, 0.0, 1.0),
                        jnp.where(bad, 1.0, d2e),
                    )

                for j0 in range(0, nodes, 4):
                    (n1, q1), (n2, q2), (n3, q3), (n4, q4) = (
                        node_nq(j0), node_nq(j0 + 1),
                        node_nq(j0 + 2), node_nq(j0 + 3),
                    )
                    q12 = q1 * q2
                    q34 = q3 * q4
                    n12 = n1 * q2 + n2 * q1
                    n34 = n3 * q4 + n4 * q3
                    total += (n12 * q34 + n34 * q12) / (q12 * q34)
            else:
                for j in range(nodes):
                    d2e, bad = node_d2e_bad(j)
                    total += jnp.where(
                        bad, 0.0, 1.0 / jnp.maximum(d2e, GUARD)
                    )
            return acc + ii * (ll / nodes) * total

        o_ref[:] = w_ref[:] * jax.lax.fori_loop(
            start, start + count, seg, jnp.zeros_like(o_ref)
        )


def _segment_discrete_kernel(meta_ref, scal_ref, ax_ref, ay_ref, az_ref,
                             ux_ref, uy_ref, uz_ref, ns_ref, ii_ref,
                             active_ref, px_ref, py_ref, pz_ref, w_ref,
                             o_ref, *, sphere: bool, paired: bool):
    """Bit-parity discrete VRL/VBL: iterate each segment's sub-lights
    INSIDE the kernel from the raw segment table, instead of materializing
    a capped point-light expansion through HBM (ops.lights.expand_segments
    + compact_valid).

    Reproduces the reference double loop exactly (ray_compute_color.comp:
    11-24, beam_compute_color.comp:11-24): sub-light s of segment k sits at
    ``from + (s*lightRayStepSize)*dir`` with intensity ``I/steps``,
    ``steps = floor(len/step)`` — evaluated as a point light (Ray) or a
    beamRadius sphere light (Beam).  The sub-light position is scalar math
    in SMEM (amortized over the whole 512x128 sample block); only the
    distance/contribution math is vector work.  UNCAPPED: the inner
    fori_loop's trip count is each segment's true ``steps``, so the
    max_points_per_segment / expanded_light_capacity truncation of the
    expansion path does not exist here.

    Segment columns are 1-D SMEM arrays [ax, ay, az, ux, uy, uz, steps
    (i32), I/(steps*4pi)]; scal_ref: [light_ray_step_size, beam_radius].
    """
    i = pl.program_id(0)

    @pl.when(active_ref[i] == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(active_ref[i] != 0)
    def _():
        start = meta_ref[0]
        count = meta_ref[1]
        lstep = scal_ref[0]
        radius = scal_ref[1]
        px, py, pz = px_ref[:], py_ref[:], pz_ref[:]

        def d2e_bad(cols, s, ns):
            ax, ay, az, ux, uy, uz = cols
            # (s*step)*dir, matching expand_segments' evaluation order.
            sf = s.astype(jnp.float32) * lstep
            dx = px - (ax + sf * ux)
            dy = py - (ay + sf * uy)
            dz = pz - (az + sf * uz)
            d2 = dx * dx + dy * dy + dz * dz
            if sphere:
                dist = jnp.sqrt(d2)
                dd = dist - radius
                d2e = dd * dd
                bad = (d2e < GUARD) | (dist == 0.0)
            else:
                d2e = d2
                bad = d2e < GUARD
            if paired:
                bad = bad | (s >= ns)
            return d2e, bad

        def seg(k, acc):
            cols = (ax_ref[k], ay_ref[k], az_ref[k],
                    ux_ref[k], uy_ref[k], uz_ref[k])
            ns = ns_ref[k]
            ii = ii_ref[k]

            if paired:
                # One divide per 4 sub-lights (see gather_lanes
                # _discrete_kernel): guarded/overrun terms q=PAIR_BIG.
                from .gather_lanes import PAIR_BIG

                def group(g, inner):
                    qs = []
                    for j in range(4):
                        d2e, bad = d2e_bad(cols, g * 4 + j, ns)
                        qs.append(
                            jnp.where(bad, jnp.float32(PAIR_BIG), d2e)
                        )
                    q12 = qs[0] * qs[1]
                    q34 = qs[2] * qs[3]
                    s12 = qs[0] + qs[1]
                    s34 = qs[2] + qs[3]
                    return inner + (s12 * q34 + s34 * q12) / (q12 * q34)

                part = jax.lax.fori_loop(
                    0, (ns + 3) // 4, group, jnp.zeros_like(acc)
                )
                return acc + ii * part

            def sub(s, inner):
                d2e, bad = d2e_bad(cols, s, ns)
                return inner + jnp.where(
                    bad, 0.0, ii / jnp.maximum(d2e, GUARD)
                )

            return jax.lax.fori_loop(0, ns, sub, acc)

        o_ref[:] = w_ref[:] * jax.lax.fori_loop(
            start, start + count, seg, jnp.zeros_like(o_ref)
        )


def _segment_kernel(meta_ref, ax_ref, ay_ref, az_ref, ux_ref, uy_ref,
                    uz_ref, ll_ref, ii_ref, active_ref, px_ref, py_ref,
                    pz_ref, w_ref, o_ref):
    """Analytic VRL: closed-form line integral per (sample, segment).

    The reference discretizes each RayLight segment every lightRayStepSize
    into point lights of I/steps (ray_compute_color.comp:11-24) — a Riemann
    sum of I/(4 pi L) * integral_0^L ds / d(s)^2 with
    d(s)^2 = s^2 - 2 b s + c, b = (p-a).u, c = |p-a|^2:

        integral = [atan((L-b)/q) + atan(b/q)] / q,  q = sqrt(c - b^2)

    One evaluation per SEGMENT instead of per sub-light — typically 30-100x
    fewer terms at default lightRayStepSize.  Approximation mode (not
    bit-parity): it is the h->0 limit of the reference's sum.

    Segment columns as 1-D SMEM arrays: ax, ay, az, ux, uy, uz, L,
    I/(4 pi L).
    """
    i = pl.program_id(0)

    @pl.when(active_ref[i] == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(active_ref[i] != 0)
    def _():
        start = meta_ref[0]
        count = meta_ref[1]
        px, py, pz = px_ref[:], py_ref[:], pz_ref[:]

        def seg(k, acc):
            ax = ax_ref[k]
            ay = ay_ref[k]
            az = az_ref[k]
            ux = ux_ref[k]
            uy = uy_ref[k]
            uz = uz_ref[k]
            ll = ll_ref[k]
            ii = ii_ref[k]
            dx = px - ax
            dy = py - ay
            dz = pz - az
            b = dx * ux + dy * uy + dz * uz
            c = dx * dx + dy * dy + dz * dz
            q2 = jnp.maximum(c - b * b, GUARD)
            q = jnp.sqrt(q2)
            integral = (_atan((ll - b) / q) + _atan(b / q)) / q
            return acc + ii * integral

        o_ref[:] = w_ref[:] * jax.lax.fori_loop(
            start, start + count, seg, jnp.zeros_like(o_ref)
        )


def gather_vpu(
    px,
    py,
    pz,
    wm,
    block_active,
    l_pos,
    l_int,
    start,
    count,
    *,
    sphere: bool,
    radius=0.0,
    paired: bool = False,
    interpret: bool = False,
):
    """px/py/pz/wm: (M, 128) world coords + gather weights; block_active:
    (M // TILE_M,) int32; lights (L <= SMEM_LIGHT_LIMIT); [start,
    start+count) = valid range.  Returns (M, 128) WEIGHTED radiance sums
    (w * sum over lights) — the weight multiply is folded into the kernel
    so no separate pass over the planes is needed.  ``paired=True``: one
    divide per 4 lights (reassociation-only deviation, <= 3e-5 rel)."""
    M = px.shape[0]
    assert M % TILE_M == 0, M
    L = l_pos.shape[0]
    li = l_int * jnp.float32(1.0 / FOUR_PI)
    meta = jnp.stack(
        [jnp.asarray(start, jnp.int32), jnp.asarray(count, jnp.int32)]
    )
    grid = (M // TILE_M,)
    spec = lambda: pl.BlockSpec(
        (TILE_M, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_kernel, sphere=sphere, paired=paired),
        grid=grid,
        in_specs=[smem()] * 7 + [spec()] * 4,
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * M * 128 * max(L, 1),
            bytes_accessed=4 * M * 128 * 4,
            transcendentals=M * 128 * L if sphere else 0,
        ),
    )(
        meta,
        jnp.asarray(radius, jnp.float32).reshape(1),
        l_pos[:, 0],
        l_pos[:, 1],
        l_pos[:, 2],
        li,
        block_active,
        px,
        py,
        pz,
        wm,
    )


def gather_segments_discrete(
    px,
    py,
    pz,
    wm,
    block_active,
    pos_from,
    pos_to,
    intensity,
    valid,
    light_ray_step_size,
    *,
    sphere_radius: float | None = None,
    paired: bool = False,
    interpret: bool = False,
):
    """Reference-parity discrete segment gather, sub-lights iterated
    in-kernel (see _segment_discrete_kernel).  Bit-equal to the
    expand_segments + gather_vpu pipeline whenever the latter's caps don't
    bind, and exact (uncapped) beyond them.  ``paired=True``: same
    quadrature with one divide per 4 sub-lights (~1.6x faster, <= 3e-5
    relative reassociation error).

    px/py/pz/wm: (M, 128) planes; segments: (L,) arrays with a contiguous
    valid range.  ``sphere_radius=None`` -> Ray (point sub-lights),
    otherwise Beam (sphere sub-lights of that radius).
    Returns (M, 128) WEIGHTED radiance sums.
    """
    M = px.shape[0]
    assert M % TILE_M == 0, M
    seg = pos_to - pos_from
    length = jnp.linalg.norm(seg, axis=-1)
    safe_len = jnp.where(length > 0, length, 1.0)
    u = seg / safe_len[:, None]
    # floor(len/step) with f32 division + int cast — identical to
    # expand_segments (ray_compute_color.comp:15 uint semantics).
    steps = (length / light_ray_step_size).astype(jnp.int32)
    live = valid & (steps > 0)
    ns = jnp.where(live, steps, 0)
    # Two-step I/steps then *1/(4 pi), matching the expansion pipeline's
    # float evaluation order exactly.
    ii = (
        intensity / jnp.maximum(steps, 1).astype(jnp.float32)
    ) * jnp.float32(1.0 / FOUR_PI)
    ii = jnp.where(live, ii, 0.0)
    valid_i = valid.astype(jnp.int32)
    meta = jnp.stack([jnp.argmax(valid_i), jnp.sum(valid_i)])
    scal = jnp.stack([
        jnp.asarray(light_ray_step_size, jnp.float32),
        jnp.asarray(
            0.0 if sphere_radius is None else sphere_radius, jnp.float32
        ),
    ])
    grid = (M // TILE_M,)
    spec = lambda: pl.BlockSpec(
        (TILE_M, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    L = pos_from.shape[0]
    return pl.pallas_call(
        functools.partial(
            _segment_discrete_kernel, sphere=sphere_radius is not None,
            paired=paired,
        ),
        grid=grid,
        in_specs=[smem()] * 11 + [spec()] * 4,
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # Scheduling hint only: assume ~32 sub-lights per segment.
            flops=10 * M * 128 * max(L, 1) * 32,
            bytes_accessed=4 * M * 128 * 4,
            transcendentals=(
                (M * 128 * L * 32) if sphere_radius is not None else 0
            ),
        ),
    )(
        meta, scal,
        pos_from[:, 0], pos_from[:, 1], pos_from[:, 2],
        u[:, 0], u[:, 1], u[:, 2], ns, ii,
        block_active, px, py, pz, wm,
    )


def gather_segments_analytic(
    px,
    py,
    pz,
    wm,
    block_active,
    pos_from,
    pos_to,
    intensity,
    valid,
    *,
    sphere_radius: float | None = None,
    quad_nodes: int = 16,
    paired: bool = False,
    interpret: bool = False,
):
    """Analytic/quadrature segment gather over raw segments (no expansion).

    px/py/pz: (M, 128) world coords (padded to TILE_M blocks);
    segments: (L,) arrays; valid must be a contiguous prefix/range.
    ``sphere_radius=None``: closed-form VRL (point sub-lights);
    otherwise: ``quad_nodes``-point midpoint quadrature of the VBL
    sphere-light integrand.  Returns (M, 128) radiance sums equal to the
    h->0 limit of the reference's per-sub-light sum.
    """
    from ..lights import FOUR_PI

    M = px.shape[0]
    assert M % TILE_M == 0, M
    seg = pos_to - pos_from
    length = jnp.linalg.norm(seg, axis=-1)
    safe_len = jnp.where(length > 0, length, 1.0)
    u = seg / safe_len[:, None]
    ii = jnp.where(
        valid & (length > 0),
        intensity / (jnp.float32(FOUR_PI) * safe_len),
        0.0,
    )
    cols = (
        pos_from[:, 0], pos_from[:, 1], pos_from[:, 2],
        u[:, 0], u[:, 1], u[:, 2], length, ii,
    )
    valid_i = valid.astype(jnp.int32)
    meta = jnp.stack([jnp.argmax(valid_i), jnp.sum(valid_i)])
    grid = (M // TILE_M,)
    spec = lambda: pl.BlockSpec(
        (TILE_M, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    L = pos_from.shape[0]
    if sphere_radius is None:
        return pl.pallas_call(
            _segment_kernel,
            grid=grid,
            in_specs=[smem()] * 10 + [spec()] * 4,
            out_specs=spec(),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=25 * M * 128 * max(L, 1),
                bytes_accessed=4 * M * 128 * 4,
                transcendentals=2 * M * 128 * L,
            ),
        )(meta, *cols, block_active, px, py, pz, wm)
    return pl.pallas_call(
        functools.partial(_segment_sphere_kernel, nodes=quad_nodes,
                          paired=paired),
        grid=grid,
        in_specs=[smem()] * 11 + [spec()] * 4,
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(15 + 7 * quad_nodes) * M * 128 * max(L, 1),
            bytes_accessed=4 * M * 128 * 4,
            transcendentals=quad_nodes * M * 128 * L,
        ),
    )(
        meta,
        jnp.asarray(sphere_radius, jnp.float32).reshape(1),
        *cols,
        block_active,
        px,
        py,
        pz,
        wm,
    )
