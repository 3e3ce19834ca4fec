"""Lane-per-ray radiance gather — the CompactView shade kernels.

Layout: the compacted hit rays' sample planes are stored TRANSPOSED as
(Cp, Rc): each VPU *lane* is one ray, each sublane row one march sample.
Compared with the slot-stream (M, 128) layout of gather_vpu this buys:

  * full lane occupancy for any per-ray sample count C (the slot layout
    wastes lanes whenever C % 128 != 0, and re-laying (Rc, C) planes into
    (M, 128) costs an HBM relayout pass per call);
  * the per-ray radiance reduction happens INSIDE the kernel as a sublane
    sum — the output is already the compact per-ray color vector (1, Rc),
    so no per-frame segment reduction, scatter, or relayout exists at all
    (TPU scatters measured 15x slower than the entire shade kernel);
  * per-block DYNAMIC sample bounds: lanes arrive sorted by sample count
    (render.color.compact_view), so each block loops only over the sublane
    slabs its busiest lane needs — the sum of block maxima hugs the true
    nonzero sample count instead of the padded C.

Inner math is identical term-for-term to gather_vpu (same reference
semantics: common_functions.h:186-201 point/sphere lights,
ray/beam_compute_color.comp:11-24 discrete sub-light sums, and the
analytic segment integrals); only the loop geometry differs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lights import FOUR_PI, GUARD
from .gather_vpu import (
    _atan, _closed_paired_sum, _cross_q2, _node_sum, _quad_nodes_nq,
    _subtended_angle, _vrl_paired_sum,
)

TILE_L = 1024  # rays (lanes) per block
SLAB = 8  # sublane rows per slab (f32 sublane quantum)


def _slab_loop(need_ref, px_ref, py_ref, pz_ref, w_ref, o_ref, body):
    """Shared skeleton: init output, loop the sublane slabs this block's
    busiest lane needs, accumulate per-slab ray sums into the output row."""
    i = pl.program_id(0)
    o_ref[:] = jnp.zeros_like(o_ref)
    nslab = (need_ref[i] + (SLAB - 1)) // SLAB

    def slab(j, _):
        r = pl.ds(pl.multiple_of(j * SLAB, SLAB), SLAB)
        px = px_ref[r, :]
        py = py_ref[r, :]
        pz = pz_ref[r, :]
        acc = body(px, py, pz)
        o_ref[:] += jnp.sum(w_ref[r, :] * acc, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, nslab, slab, 0)


def _point_kernel(meta_ref, rad_ref, lx_ref, ly_ref, lz_ref, li_ref,
                  need_ref, px_ref, py_ref, pz_ref, w_ref, o_ref,
                  *, sphere: bool, paired: bool):
    """Point/VPL and Sphere/VSL light loop over lane planes.

    ``paired=False`` is the bit-parity evaluation: one guarded divide per
    (sample, light) pair, exactly the reference's term order
    (common_functions.h:186-201 summed as in point_compute_color.comp:9-15).
    ``paired=True`` computes the SAME light sum with one divide per 4
    lights via a rational combination with per-term NUMERATORS
    (lights have individual intensities, unlike the constant-``ii``
    sub-light groups of _discrete_kernel):

        n1/q1 + n2/q2 + n3/q3 + n4/q4
          = ((n1 q2 + n2 q1) q34 + (n3 q4 + n4 q3) q12) / (q12 q34)

    with guarded/overrun terms set to (n=0, q=1) — their contribution is
    EXACTLY zero, so the only deviation from the exact path is the
    reassociation of the divides (measured <= 3e-5 relative).  The f32
    divide dominates the exact pair cost, so amortizing it is the same
    ~1.5x lever the paired discrete eval gave Ray.  Range note: q products
    stay finite for d^2 up to ~1e9 per term (q12*q34 <= ~1e36 < f32 max) —
    orders of magnitude beyond the UI's coordinate range."""
    start = meta_ref[0]
    count = meta_ref[1]
    radius = rad_ref[0]
    L = lx_ref.shape[0]

    def body(px, py, pz):
        def nq(k, px, py, pz):
            kc = jnp.minimum(k, L - 1)
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
            bad = bad | (k >= start + count)
            return (
                jnp.where(bad, 0.0, li_ref[kc]),
                jnp.where(bad, 1.0, d2e),
            )

        if paired:
            def group(g, acc):
                k0 = start + g * 4
                n1, q1 = nq(k0, px, py, pz)
                n2, q2 = nq(k0 + 1, px, py, pz)
                n3, q3 = nq(k0 + 2, px, py, pz)
                n4, q4 = nq(k0 + 3, px, py, pz)
                q12 = q1 * q2
                q34 = q3 * q4
                n12 = n1 * q2 + n2 * q1
                n34 = n3 * q4 + n4 * q3
                return acc + (n12 * q34 + n34 * q12) / (q12 * q34)

            return jax.lax.fori_loop(
                0, (count + 3) // 4, group, jnp.zeros_like(px)
            )

        def light(k, acc):
            dx = px - lx_ref[k]
            dy = py - ly_ref[k]
            dz = pz - lz_ref[k]
            d2 = dx * dx + dy * dy + dz * dz
            if sphere:
                dist = jnp.sqrt(d2)
                dd = dist - radius
                d2e = dd * dd
                bad = (d2e < GUARD) | (dist == 0.0)
            else:
                d2e = d2
                bad = d2e < GUARD
            return acc + jnp.where(
                bad, 0.0, li_ref[k] / jnp.maximum(d2e, GUARD)
            )

        return jax.lax.fori_loop(
            start, start + count, light, jnp.zeros_like(px)
        )

    _slab_loop(need_ref, px_ref, py_ref, pz_ref, w_ref, o_ref, body)


PAIR_BIG = 1e9  # "discarded" q for the paired eval; contributes <= 1e-9


def _discrete_kernel(meta_ref, scal_ref, ax_ref, ay_ref, az_ref, ux_ref,
                     uy_ref, uz_ref, ns_ref, ii_ref, need_ref,
                     px_ref, py_ref, pz_ref, w_ref, o_ref,
                     *, sphere: bool, paired: bool):
    """Lane-layout twin of gather_vpu._segment_discrete_kernel.

    ``paired=False`` is the bit-parity evaluation (one guarded divide per
    sub-light, exactly the reference's term order).  ``paired=True``
    computes the SAME sub-light sum with one divide per 4 sub-lights:
    sum_i 1/q_i over a group of 4 is combined into a single rational
    (s12*q34 + s34*q12) / (q12*q34), with guarded/overrun terms set to
    q=PAIR_BIG so they contribute <= 1e-9 instead of exactly 0.  The f32
    divide costs ~10 VPU slots — amortizing it is a ~1.6x (Ray) frame
    speedup; reassociation error measured <= 3e-5 relative
    (tests/test_gather.py, scripts/microbench_formulations.py)."""
    start = meta_ref[0]
    count = meta_ref[1]
    lstep = scal_ref[0]
    radius = scal_ref[1]

    def body(px, py, pz):
        def d2e_bad(k_cols, s, ns, px, py, pz):
            ax, ay, az, ux, uy, uz = k_cols
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
            ii = ii_ref[k]
            ns = ns_ref[k]

            if paired:
                def group(g, inner):
                    qs = []
                    for j in range(4):
                        d2e, bad = d2e_bad(cols, g * 4 + j, ns, px, py, pz)
                        qs.append(jnp.where(bad, jnp.float32(PAIR_BIG), d2e))
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
                d2e, bad = d2e_bad(cols, s, ns, px, py, pz)
                return inner + jnp.where(
                    bad, 0.0, ii / jnp.maximum(d2e, GUARD)
                )

            return jax.lax.fori_loop(0, ns, sub, acc)

        return jax.lax.fori_loop(
            start, start + count, seg, jnp.zeros_like(px)
        )

    _slab_loop(need_ref, px_ref, py_ref, pz_ref, w_ref, o_ref, body)


def _analytic_kernel(meta_ref, rad_ref, ax_ref, ay_ref, az_ref, ux_ref,
                     uy_ref, uz_ref, ll_ref, ii_ref, need_ref,
                     px_ref, py_ref, pz_ref, w_ref, o_ref,
                     *, nodes: int | None, paired: bool = False,
                     rule: str = "midpoint"):
    """Lane-layout twin of _segment_kernel (nodes=None, closed-form VRL)
    and _segment_sphere_kernel (nodes-point VBL quadrature under ``rule``
    — "midpoint" in s or Gauss-Legendre in the "tangent"-transformed
    variable; see gather_vpu._quad_nodes_nq).

    ``paired=True``: for node quadratures ("midpoint"/"tangent") the node
    sum's one-divide-per-node becomes one divide per 4 nodes via the same
    rational combination as _point_kernel (guarded nodes (n=0, q=1)
    contribute exactly zero).  For the divide-per-SEGMENT forms — the
    closed-form VBL antiderivative and the closed-form VRL — segments are
    processed two per trip with the per-segment divides shared across the
    pair (gather_vpu._closed_paired_sum / _vrl_paired_sum).  All variants
    are reassociation-level deviations."""
    start = meta_ref[0]
    count = meta_ref[1]
    radius = rad_ref[0]

    def body(px, py, pz):
        if paired and nodes is None:
            return _vrl_paired_sum(
                ax_ref, ay_ref, az_ref, ux_ref, uy_ref, uz_ref,
                ll_ref, ii_ref, start, count, px, py, pz,
            )
        if paired and rule == "closed":
            return _closed_paired_sum(
                ax_ref, ay_ref, az_ref, ux_ref, uy_ref, uz_ref,
                ll_ref, ii_ref, start, count, radius, px, py, pz,
            )

        def seg(k, acc):
            dx = px - ax_ref[k]
            dy = py - ay_ref[k]
            dz = pz - az_ref[k]
            b = dx * ux_ref[k] + dy * uy_ref[k] + dz * uz_ref[k]
            ll = ll_ref[k]
            ii = ii_ref[k]
            if nodes is None:
                q2 = _cross_q2(
                    (dx, dy, dz), (ux_ref[k], uy_ref[k], uz_ref[k])
                )
                iq = jax.lax.rsqrt(q2)
                integral = _subtended_angle(b, q2, q2 * iq, ll) * iq
                return acc + ii * integral

            node_nq, scale = _quad_nodes_nq(
                rule, nodes, (dx, dy, dz),
                (ux_ref[k], uy_ref[k], uz_ref[k]), b, ll, radius,
            )
            total = _node_sum(node_nq, nodes, paired, acc)
            return acc + ii * scale * total

        return jax.lax.fori_loop(
            start, start + count, seg, jnp.zeros_like(px)
        )

    _slab_loop(need_ref, px_ref, py_ref, pz_ref, w_ref, o_ref, body)


def _call(kernel, n_scalars, scalars, planes, block_need, Cp, Rc,
          interpret, cost):
    spec = lambda: pl.BlockSpec(
        (Cp, TILE_L), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Rc // TILE_L,),
        in_specs=[smem()] * (n_scalars + 1) + [spec()] * 4,
        out_specs=pl.BlockSpec(
            (1, TILE_L), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, Rc), jnp.float32),
        interpret=interpret,
        cost_estimate=cost,
    )(*scalars, block_need, *planes)
    return out[0]


def _prep(px, py, pz, wm, lane_need):
    """Validate (Cp, Rc) lane planes; per-block sample bounds."""
    Cp, Rc = px.shape
    assert Cp % SLAB == 0 and Rc % TILE_L == 0, (Cp, Rc)
    if lane_need is None:
        nz = wm != 0.0
        any_ = jnp.any(nz, axis=0)
        lane_need = jnp.where(
            any_, Cp - jnp.argmax(nz[::-1, :], axis=0), 0
        ).astype(jnp.int32)
    block_need = jnp.max(
        lane_need.reshape(Rc // TILE_L, TILE_L), axis=-1
    ).astype(jnp.int32)
    return Cp, Rc, block_need


def gather_lanes(px, py, pz, wm, l_pos, l_int, start, count,
                 *, sphere: bool, radius=0.0, lane_need=None,
                 paired: bool = False,
                 interpret: bool = False):
    """Point/sphere gather over lane planes (Cp, Rc).  Returns (Rc,)
    per-ray WEIGHTED radiance sums (sum over samples of w * sum over
    lights).  ``paired=True``: one divide per 4 lights (_point_kernel) —
    reassociation-only deviation, <= 3e-5 relative."""
    Cp, Rc, block_need = _prep(px, py, pz, wm, lane_need)
    L = l_pos.shape[0]
    li = l_int * jnp.float32(1.0 / FOUR_PI)
    meta = jnp.stack(
        [jnp.asarray(start, jnp.int32), jnp.asarray(count, jnp.int32)]
    )
    scalars = (
        meta, jnp.asarray(radius, jnp.float32).reshape(1),
        l_pos[:, 0], l_pos[:, 1], l_pos[:, 2], li,
    )
    cost = pl.CostEstimate(
        flops=12 * Cp * Rc * max(L, 1),
        bytes_accessed=4 * Cp * Rc * 4,
        transcendentals=Cp * Rc * L if sphere else 0,
    )
    return _call(
        functools.partial(_point_kernel, sphere=sphere, paired=paired),
        6, scalars, (px, py, pz, wm), block_need, Cp, Rc, interpret, cost,
    )


def segment_cols(pos_from, pos_to, intensity, valid):
    """Shared segment preprocessing: (u, length, safe_length, start, count)."""
    seg = pos_to - pos_from
    length = jnp.linalg.norm(seg, axis=-1)
    safe = jnp.where(length > 0, length, 1.0)
    u = seg / safe[:, None]
    valid_i = valid.astype(jnp.int32)
    return u, length, safe, jnp.argmax(valid_i), jnp.sum(valid_i)


def gather_segments_discrete_lanes(
    px, py, pz, wm, pos_from, pos_to, intensity, valid,
    light_ray_step_size, *, sphere_radius=None, lane_need=None,
    paired: bool = False,
    interpret: bool = False,
):
    """Discrete (reference-parity, uncapped) segment gather over lane
    planes; term-for-term the math of gather_vpu.gather_segments_discrete.
    ``paired=True``: same quadrature, one divide per 4 sub-lights
    (_discrete_kernel) — ~1.6x faster, <= 3e-5 relative reassociation
    error."""
    Cp, Rc, block_need = _prep(px, py, pz, wm, lane_need)
    u, length, _safe, start, count = segment_cols(
        pos_from, pos_to, intensity, valid
    )
    steps = (length / light_ray_step_size).astype(jnp.int32)
    live = valid & (steps > 0)
    ns = jnp.where(live, steps, 0)
    ii = (
        intensity / jnp.maximum(steps, 1).astype(jnp.float32)
    ) * jnp.float32(1.0 / FOUR_PI)
    ii = jnp.where(live, ii, 0.0)
    meta = jnp.stack([start, count])
    scal = jnp.stack([
        jnp.asarray(light_ray_step_size, jnp.float32),
        jnp.asarray(
            0.0 if sphere_radius is None else sphere_radius, jnp.float32
        ),
    ])
    scalars = (
        meta, scal,
        pos_from[:, 0], pos_from[:, 1], pos_from[:, 2],
        u[:, 0], u[:, 1], u[:, 2], ns, ii,
    )
    L = pos_from.shape[0]
    cost = pl.CostEstimate(
        flops=10 * Cp * Rc * max(L, 1) * 32,
        bytes_accessed=4 * Cp * Rc * 4,
        transcendentals=(
            (Cp * Rc * L * 32) if sphere_radius is not None else 0
        ),
    )
    return _call(
        functools.partial(
            _discrete_kernel, sphere=sphere_radius is not None,
            paired=paired,
        ),
        10, scalars, (px, py, pz, wm), block_need, Cp, Rc, interpret, cost,
    )


def gather_segments_analytic_lanes(
    px, py, pz, wm, pos_from, pos_to, intensity, valid,
    *, sphere_radius=None, quad_nodes: int = 16,
    quad_rule: str = "midpoint", lane_need=None,
    paired: bool = False,
    interpret: bool = False,
):
    """Analytic VRL / quadrature VBL over lane planes (gather_vpu
    gather_segments_analytic twin).  ``quad_rule`` selects the VBL node
    placement (gather_vpu._quad_nodes_nq).  ``paired=True``: one divide
    per 4 quadrature nodes for node rules; the closed-rule VBL and the
    closed-form VRL pair their per-segment divides across two segments
    per trip instead (see _analytic_kernel)."""
    Cp, Rc, block_need = _prep(px, py, pz, wm, lane_need)
    u, length, safe, start, count = segment_cols(
        pos_from, pos_to, intensity, valid
    )
    ii = jnp.where(
        valid & (length > 0),
        intensity / (jnp.float32(FOUR_PI) * safe),
        0.0,
    )
    meta = jnp.stack([start, count])
    scalars = (
        meta,
        jnp.asarray(
            0.0 if sphere_radius is None else sphere_radius, jnp.float32
        ).reshape(1),
        pos_from[:, 0], pos_from[:, 1], pos_from[:, 2],
        u[:, 0], u[:, 1], u[:, 2], length, ii,
    )
    L = pos_from.shape[0]
    from .gather_vpu import effective_quad_nodes

    nodes = (
        None if sphere_radius is None
        else effective_quad_nodes(quad_rule, quad_nodes)
    )
    closed = sphere_radius is not None and quad_rule == "closed"
    cost = pl.CostEstimate(
        flops=(25 if nodes is None else 15 + (50 if closed else 7 * nodes))
        * Cp * Rc * max(L, 1),
        bytes_accessed=4 * Cp * Rc * 4,
        transcendentals=(2 if nodes is None else (1 if closed else nodes))
        * Cp * Rc * L,
    )
    return _call(
        functools.partial(_analytic_kernel, nodes=nodes, paired=paired,
                          rule=quad_rule),
        10, scalars, (px, py, pz, wm), block_need, Cp, Rc, interpret, cost,
    )
