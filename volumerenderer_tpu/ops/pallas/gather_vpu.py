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


def _pos_ratio_parts(num, den):
    """min/max decomposition of a nonnegative-numerator ratio for
    _atan_pos_ratio-style evaluation: (lo, hi, inverted) with the target
    tangent = lo/hi <= 1 (inverted: the angle is pi/2 - atan(lo/hi))."""
    ad = jnp.abs(den)
    inv = num > ad
    lo = jnp.minimum(num, ad)
    hi = jnp.maximum(num, ad)
    return lo, hi, inv


def _atan_pos_poly(z, inverted, den):
    """Finish a _atan_pos_ratio evaluation from its precomputed min/max
    ratio z = lo/hi <= 1: minimax polynomial (|err| < 2e-5) + the
    inversion and den-sign quadrant logic."""
    z2 = z * z
    p = z * (
        0.9998660
        + z2
        * (-0.3302995 + z2 * (0.1801410 + z2 * (-0.0851330 + z2 * 0.0208351)))
    )
    p = jnp.where(inverted, jnp.float32(1.5707963267948966) - p, p)
    return jnp.where(den < 0.0, jnp.float32(_PI_F32) - p, p)


def _atan_pos_ratio(num, den):
    """The angle in [0, pi] whose tangent is ``num / den``, for num >= 0 —
    i.e. ``atan(num/den) + pi * (den < 0)`` — with ONE divide: the
    quotient and _atan's |x| > 1 range-reduction divide fold into a
    min/max ratio (z = min/max <= 1 by construction, so no reduction
    branch remains).  Same minimax polynomial as _atan (|err| < 2e-5).

    Both kernel call sites satisfy num >= 0 exactly: the VRL subtended
    angle's numerator is L*q, and the VBL closed form's is
    kappa*(ds + qL) with ds >= 0 in both its branches (each a sum of
    same-sign terms)."""
    lo, hi, inv = _pos_ratio_parts(num, den)
    z = lo / jnp.maximum(hi, 1e-30)
    return _atan_pos_poly(z, inv, den)


def _paired_pos_ratio_atans(num_a, den_a, num_b, den_b):
    """TWO _atan_pos_ratio evaluations sharing ONE divide: the reciprocal
    of hi_a*hi_b serves both min/max ratios (z_a = lo_a*hi_b*inv, likewise
    z_b) — the divide is the most expensive VPU op of the gather inner
    loops (~19 fma-equivalent slots, probe_beam_roofline), so halving it
    across consecutive segments is the same lever as the 4-term pairing
    of the discrete/point loops; deviation is reassociation-level
    (2-3 ulp on z).  Range: hi is bounded below by the guard-floored
    geometry at both call sites (VRL: den -> q2 >= GUARD when num -> 0;
    VBL closed: dent >= 4 qc^2 >= 4 GUARD when numt -> 0) and above by
    ~kappa*ds ~ 1e13 at UI coordinate ranges, so hi_a*hi_b stays inside
    f32 with orders of magnitude to spare; the 1e-30 floor matches
    _atan_pos_ratio's."""
    lo_a, hi_a, inv_a = _pos_ratio_parts(num_a, den_a)
    lo_b, hi_b, inv_b = _pos_ratio_parts(num_b, den_b)
    inv = 1.0 / jnp.maximum(hi_a * hi_b, jnp.float32(1e-30))
    ang_a = _atan_pos_poly(lo_a * (hi_b * inv), inv_a, den_a)
    ang_b = _atan_pos_poly(lo_b * (hi_a * inv), inv_b, den_b)
    return ang_a, ang_b


def _cos(x):
    """Polynomial cos for the VPU on (-pi/2, pi/2) — the full range of the
    tangent-substitution node angles (theta = atan(.) is always inside it).

    Even minimax polynomial in z = x^2; |err| < 3e-7 in f32 — below f32
    roundoff of the downstream quadrature terms.
    """
    z = x * x
    return 1.0 + z * (
        -4.9999936e-01
        + z * (4.1664074e-02 + z * (-1.3856462e-03 + z * 2.3204736e-05))
    )


@functools.lru_cache(maxsize=None)
def _gauss01(n: int):
    """Gauss-Legendre nodes/weights on [0, 1] as Python float tuples
    (baked into the kernel as immediates; weights sum to 1)."""
    import numpy as np

    x, w = np.polynomial.legendre.leggauss(n)
    return tuple(((x + 1.0) / 2.0).tolist()), tuple((w / 2.0).tolist())


def _cross_q2(d, u):
    """Cancellation-free squared closest-approach distance |d x u|^2 of a
    sample to a segment's line: c - b^2 loses all significance in f32 when
    the sample sits far along the line (c ~ b^2 >> q^2)."""
    dx, dy, dz = d
    ux, uy, uz = u
    cx = dy * uz - dz * uy
    cy = dz * ux - dx * uz
    cz = dx * uy - dy * ux
    return jnp.maximum(cx * cx + cy * cy + cz * cz, GUARD)


_PI_F32 = 3.1415927410125732


def _subtended_angle(b, q2, qd, ll):
    """theta1 - theta0 of a segment [0, L] seen from closest-approach
    frame coordinates (b = along-line offset, qd = sqrt(q2) = distance to
    the line), via the tangent-difference identity

        tan(dt) = L q / (q^2 - b (L - b))

    instead of atan((L-b)/q) - atan(-b/q): for far segments subtending a
    small angle the two ~2e-5-error polynomial atans cancel
    catastrophically, and dt scales the whole contribution.  One _atan
    instead of two.  Denominator <= 0 means dt > pi/2 (numerator >= 0) —
    exactly _atan_pos_ratio's contract, which also folds the quotient and
    range-reduction divides into one."""
    den = q2 - b * (ll - b)
    return _atan_pos_ratio(ll * qd, den)


def _closed_pre(d, u, b, ll, radius):
    """Closed-form VBL geometry up to the ds RATIO: ``ds = ds_num/ds_den``
    with ds_den == 1 whenever the sample projects inside [0, L] (the
    direct sum p0 + p1 is stable there) and the conjugate-form numerator /
    denominator otherwise (the direct sum cancels there; both conjugate
    terms are then same-sign).  Returning the unevaluated ratio lets the
    paired segment loop share ONE reciprocal across two segments' conj
    divides (``_closed_paired_sum``).  Returns
    ``(ds_num, ds_den, (qc, d0, d1))``."""
    q2 = _cross_q2(d, u)
    qc = jnp.maximum(jnp.sqrt(q2), radius * jnp.float32(1.015625))
    qc2 = qc * qc
    lb = ll - b
    d0 = jnp.sqrt(qc2 + b * b)
    d1 = jnp.sqrt(qc2 + lb * lb)
    p0 = lb * d0
    p1 = b * d1
    den_c = p0 - p1
    inside = (b >= 0.0) & (b <= ll)
    ds_num = jnp.where(inside, p0 + p1, qc2 * ll * (ll - 2.0 * b))
    ds_den = jnp.where(
        inside, 1.0, jnp.where(den_c == 0.0, 1e-30, den_c)
    )
    return ds_num, ds_den, (qc, d0, d1)


def _closed_post(ds, b, ll, radius, geom):
    """Everything of the closed-form VBL antiderivative after the ds
    ratio and EXCEPT the atan evaluation: returns
    ``(n_r, q_r, t_pre, numt, dent, qc)`` where the rational node is
    ``n_r / q_r``, the atan node is ``t_pre * atan_pos_ratio(numt, dent)``,
    and ``qc`` is the integral scale.  Split from :func:`_closed_pre` so
    callers can batch the atans (and conj/rational divides) of TWO
    segments through shared reciprocals — the divide is the most
    expensive VPU op of the inner loop (probe_beam_roofline).

    All identities are the d0*d1-rescaled forms documented at the
    ``rule == "closed"`` branch of :func:`_quad_nodes_nq`."""
    qc, d0, d1 = geom
    lb = ll - b
    sl = qc * ll
    A = (qc - radius) * (qc + radius)
    irA = jax.lax.rsqrt(A)
    kappa = (qc + radius) * irA
    n_r = radius * (ds - radius * ll)
    q_r = (A * qc) * ((d0 - radius) * (d1 - radius))
    numt = kappa * (ds + sl)
    dent = (d0 + qc) * (d1 + qc) - (kappa * kappa) * (b * lb)
    t_pre = (2.0 * qc) * (irA * irA * irA)
    return n_r, q_r, t_pre, numt, dent, qc


def _closed_parts(d, u, b, ll, radius):
    """Single-segment composition of pre + post (ds_den == 1 inside the
    projection range, so the divide is exact there — bit-identical to
    evaluating the direct sum)."""
    ds_num, ds_den, geom = _closed_pre(d, u, b, ll, radius)
    return _closed_post(ds_num / ds_den, b, ll, radius, geom)


def _quad_nodes_nq(rule: str, nodes: int, d, u, b, ll, radius):
    """Per-node (numerator, denominator) generator + integral scale for
    the VBL sphere-light quadrature rules (shared by the slot and lane
    kernels).  Node j contributes n_j/q_j; guarded and padding (j >= nodes)
    terms are (0, 1) — exactly zero.  The segment's contribution is
    ``ii * scale * sum_j n_j/q_j`` with ii = I/(4 pi L).

    ``"midpoint"``: composite midpoint in s — d^2(s) = s^2 - 2 b s + c,
    n = 1, q = (d - r)^2, scale = L/nodes (the round-2 rule).

    ``"tangent"``: Gauss-Legendre in theta under s = b + q tan(theta),
    q = closest-approach distance sqrt(c - b^2).  The integrand transforms
    to q / (q - r cos theta)^2 dtheta — near-constant when q >> r — so
    n = w_j, q = (q - r cos theta_j)^2, scale = dtheta q (the integral
    over s itself; ii carries the 1/L as in the midpoint rule, whose
    scale (L/nodes) Sum f is the same integral).  The reference
    guard (d - r)^2 < GUARD is evaluated in transformed units as
    e^2 < GUARD cos^2 (d = q/cos, d - r = e/cos); q^2 is clamped to GUARD,
    so d > 0 always holds and the d == 0 guard is vacuous (on the guarded
    near-singular set the mode is approximate under every rule).
    """
    if rule == "midpoint":
        # Only this rule needs |d|^2; the tangent/closed rules build
        # everything from the cancellation-free |d x u|^2, so c is
        # computed here rather than burned in every caller's seg body.
        dx, dy, dz = d
        c = dx * dx + dy * dy + dz * dz

        def node_nq(j):
            if j >= nodes:
                return jnp.float32(0.0), jnp.float32(1.0)
            s = (j + 0.5) / nodes * ll
            d2 = jnp.maximum(c - 2.0 * b * s + s * s, 0.0)
            d = jnp.sqrt(d2)
            dd = d - radius
            d2e = dd * dd
            bad = (d2e < GUARD) | (d == 0.0)
            return (
                jnp.where(bad, 0.0, 1.0),
                jnp.where(bad, 1.0, d2e),
            )

        return node_nq, ll / nodes

    if rule == "tangent":
        xs, ws = _gauss01(nodes)
        # _cross_q2, not c - b^2: the f32 cancellation there (relative
        # q^2 error ~ eps * c / q^2) is amplified by the near-peak
        # 1/(q - r)^2 — measured ~3e-3 relative contribution error at
        # q ~ 1.2r.  dt via the tangent-difference identity
        # (_subtended_angle) for the same reason.
        q2 = _cross_q2(d, u)
        iq = jax.lax.rsqrt(q2)
        qd = q2 * iq  # sqrt(q2): segment-line closest-approach distance
        t0 = _atan(-b * iq)
        dt = _subtended_angle(b, q2, qd, ll)

        def node_nq(j):
            if j >= nodes:
                return jnp.float32(0.0), jnp.float32(1.0)
            cth = _cos(t0 + jnp.float32(xs[j]) * dt)
            e = qd - radius * cth
            e2 = e * e
            bad = e2 < GUARD * (cth * cth)
            return (
                jnp.where(bad, 0.0, jnp.float32(ws[j])),
                jnp.where(bad, 1.0, e2),
            )

        return node_nq, dt * qd

    if rule == "closed":
        # Exact antiderivative of the transformed integrand
        # q / (q - r cos theta)^2 (valid whenever q > r, where the
        # integrand is nonsingular):
        #
        #   G(t) = r sin t / ((q^2-r^2)(q - r cos t))
        #        + 2 q / (q^2-r^2)^(3/2) * atan(kappa tan(t/2)),
        #   kappa = sqrt((q+r)/(q-r)) = (q+r)/sqrt(q^2-r^2),
        #
        # so J = int_0^L ds/(d(s)-r)^2 = q [G(theta1) - G(theta0)].
        # Every endpoint trig value is ALGEBRAIC — cos t0 = q/d0,
        # sin t0 = -b/d0, tan(t/2) = sin t/(1 + cos t) with
        # d0 = |p - from|, d1 = |p - to| — and the atan difference
        # collapses to ONE _atan via the difference identity, with a
        # cancellation-free half-tangent difference
        #   t1h - t0h = ((s1 - s0) + sin dt) / ((1+c0)(1+c1))
        # (both numerator terms positive; sin dt = q L/(d0 d1) exactly).
        # s1 - s0 itself switches to the conjugate form
        # q^2 L (L-2b) / ((L-b) d0 - b d1) when the sample projects
        # outside [0, L] (the direct sum cancels there; the conjugate
        # denominator then has same-sign terms, and vice versa).
        #
        # q is clamped to r (1 + 1/64): for q <= r the true integral
        # diverges through the sphere surface (the regime every rule is
        # approximate in — the discrete reference's sub-light terms blow
        # up there too); the clamp yields a large saturating value.
        # Measured accuracy q >= 1.02 r: <= 2.9e-6 relative vs a 2M-node
        # f64 quadrature over q/r in [1.02, 1e5], b/L in [-20, 20]
        # (scripts/probe_closed_acc.py); the kernel's polynomial _atan
        # (2e-5) dominates in practice — ~20x tighter than tangent-8's
        # near-sphere tail and cheaper than tangent-4.
        #
        # Round-4 rescaling: every endpoint trig identity is multiplied
        # through by d0 d1 > 0, which turns the id0/id1 = rsqrt setup and
        # its normalized c0/s0/c1/s1 into direct sqrt products —
        # atan-argument and sign logic are unchanged (numt/dent is scale-
        # invariant), the rational part rides the node denominator, and
        # ~26 VPU ops/(sample, segment) disappear (probe_beam_roofline).
        # ds here is ds_old * d0 d1; sl = sin(dt) * d0 d1 = q L exactly.
        #
        # Fits the node interface as exactly TWO nodes — (n_R, q_R)
        # rational part + (T, 1) atan part — so scale = q and the node
        # loop, pairing, and both kernel layouts are reused unchanged
        # (callers force nodes=2 via effective_quad_nodes).
        n_r, q_r, t_pre, numt, dent, qc = _closed_parts(d, u, b, ll, radius)
        t_term = t_pre * _atan_pos_ratio(numt, dent)

        def node_nq(j):
            if j == 0:
                return n_r, q_r
            if j == 1:
                return t_term, jnp.float32(1.0)
            return jnp.float32(0.0), jnp.float32(1.0)

        return node_nq, qc

    raise ValueError(f"unknown quadrature rule: {rule!r}")


def effective_quad_nodes(rule: str, nodes: int) -> int:
    """Node-loop trip count for a rule: the closed form is exactly two
    interface "nodes" (rational + atan terms) regardless of the requested
    ``quad_nodes``."""
    return 2 if rule == "closed" else nodes


def _node_sum(node_nq, nodes: int, paired: bool, like):
    """sum_j n_j/q_j over the static node list: one guarded divide per node
    (paired=False) or one divide per 4 nodes via the rational combination
    (paired=True; padding/guarded (0, 1) terms contribute exactly zero)."""
    total = jnp.zeros_like(like)
    if paired:
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
            n, q = node_nq(j)
            total += n / q
    return total


def _closed_paired_sum(ax_ref, ay_ref, az_ref, ux_ref, uy_ref, uz_ref,
                       ll_ref, ii_ref, start, count, radius, px, py, pz):
    """Closed-form VBL light sum with segments processed TWO per loop trip
    and each of the three per-segment divides (conjugate ds ratio, atan
    range reduction, rational node) shared across the pair: 3 divides per
    2 segments instead of 6.  The divide is the most expensive VPU op of
    the inner loop (~19 fma-equivalent issue slots, probe_beam_roofline),
    so this is the same lever as the 4-term pairing of the discrete/point
    loops.  Deviation is reassociation-level (a few ulp on each shared
    ratio) on top of the exact antiderivative.

    Odd counts: the tail trip clamps its second index to the last valid
    segment and zeroes its intensity — q_r > 0 and dent/numt stay in the
    guarded range for any live segment, so the duplicate contributes
    exactly 0 through ii.  Range: the shared rational denominator is
    q_r_a * q_r_b ~ D^10 at coordinate scale D (q_r ~ A qc (d0-r)(d1-r)
    ~ D^5) — finite in f32 for D up to ~2e3, far beyond the UI coordinate
    range (~3e2; the unpaired path's single-segment q_r holds to ~1e7)."""

    def load(k):
        dx = px - ax_ref[k]
        dy = py - ay_ref[k]
        dz = pz - az_ref[k]
        u = (ux_ref[k], uy_ref[k], uz_ref[k])
        b = dx * u[0] + dy * u[1] + dz * u[2]
        return (dx, dy, dz), u, b, ll_ref[k]

    def seg2(g, acc):
        k0 = start + 2 * g
        k1 = jnp.minimum(k0 + 1, start + count - 1)
        da, ua, ba, la = load(k0)
        db, ub, bb, lb = load(k1)
        ii_a = ii_ref[k0]
        ii_b = jnp.where(k0 + 1 < start + count, ii_ref[k1], 0.0)
        dsn_a, dsd_a, ga = _closed_pre(da, ua, ba, la, radius)
        dsn_b, dsd_b, gb = _closed_pre(db, ub, bb, lb, radius)
        rec = 1.0 / (dsd_a * dsd_b)  # divide 1 of 3
        n_ra, q_ra, tp_a, nt_a, dt_a, qc_a = _closed_post(
            dsn_a * (dsd_b * rec), ba, la, radius, ga
        )
        n_rb, q_rb, tp_b, nt_b, dt_b, qc_b = _closed_post(
            dsn_b * (dsd_a * rec), bb, lb, radius, gb
        )
        ang_a, ang_b = _paired_pos_ratio_atans(
            nt_a, dt_a, nt_b, dt_b
        )  # divide 2 of 3
        sa = ii_a * qc_a
        sb = ii_b * qc_b
        rat = (
            (sa * n_ra) * q_rb + (sb * n_rb) * q_ra
        ) / (q_ra * q_rb)  # divide 3 of 3
        return acc + rat + sa * (tp_a * ang_a) + sb * (tp_b * ang_b)

    return jax.lax.fori_loop(
        0, (count + 1) // 2, seg2, jnp.zeros_like(px)
    )


def _vrl_paired_sum(ax_ref, ay_ref, az_ref, ux_ref, uy_ref, uz_ref,
                    ll_ref, ii_ref, start, count, px, py, pz):
    """Closed-form VRL light sum, two segments per trip, the per-segment
    atan range-reduction divides shared across the pair
    (``_paired_pos_ratio_atans``): 1 divide per 2 segments instead of 2.
    Same math as _segment_kernel's seg body otherwise (subtended angle
    via the tangent-difference identity, integral = dtheta * rsqrt(q2));
    odd-count tail handled by index clamp + zeroed intensity as in
    _closed_paired_sum."""

    def parts(k):
        dx = px - ax_ref[k]
        dy = py - ay_ref[k]
        dz = pz - az_ref[k]
        u = (ux_ref[k], uy_ref[k], uz_ref[k])
        b = dx * u[0] + dy * u[1] + dz * u[2]
        ll = ll_ref[k]
        q2 = _cross_q2((dx, dy, dz), u)
        iq = jax.lax.rsqrt(q2)
        num = ll * (q2 * iq)
        den = q2 - b * (ll - b)
        return num, den, iq

    def seg2(g, acc):
        k0 = start + 2 * g
        k1 = jnp.minimum(k0 + 1, start + count - 1)
        num_a, den_a, iq_a = parts(k0)
        num_b, den_b, iq_b = parts(k1)
        ii_a = ii_ref[k0]
        ii_b = jnp.where(k0 + 1 < start + count, ii_ref[k1], 0.0)
        ang_a, ang_b = _paired_pos_ratio_atans(num_a, den_a, num_b, den_b)
        return acc + ii_a * (ang_a * iq_a) + ii_b * (ang_b * iq_b)

    return jax.lax.fori_loop(
        0, (count + 1) // 2, seg2, jnp.zeros_like(px)
    )


def _segment_sphere_kernel(meta_ref, rad_ref, ax_ref, ay_ref, az_ref,
                           ux_ref, uy_ref, uz_ref, ll_ref, ii_ref,
                           active_ref, px_ref, py_ref, pz_ref, w_ref, o_ref,
                           *, nodes: int, paired: bool = False,
                           rule: str = "midpoint"):
    """Quadrature VBL: fixed-node quadrature of each segment's sphere-light
    integrand 1/(4 pi (d(s) - r)^2), instead of the reference's
    len/lightRayStepSize sub-lights (beam_compute_color.comp:11-24 +
    getSphereLightContribution).  Both are quadratures of the same
    integral; ``nodes`` trades accuracy for speed.

    ``rule="midpoint"``: composite midpoint in s — d^2(s) = s^2 - 2 b s + c
    from the per-segment (b, c), ~7 VPU ops/node.  ``rule="tangent"``:
    Gauss-Legendre in the tangent-transformed variable s = b + q tan(theta)
    (q = closest-approach distance), under which the integrand collapses to
    q / (q - r cos(theta))^2 — near-constant when q >> r, so 8 tangent
    nodes measure strictly more accurate than 16 midpoint nodes in every
    distance regime (scripts/microbench_formulations.py --quad-acc) at
    ~half the per-(sample, light) cost: one _cos + fma + (pairable) divide
    per node plus a 2-_atan setup shared with the VRL closed form.

    ``paired=True``: one divide per 4 nodes via the rational combination of
    gather_lanes._point_kernel (guarded nodes (n=0, q=1) contribute exactly
    zero) — reassociation-only deviation on an already-approximate mode.
    Tangent weights ride the per-node numerators, so pairing costs nothing
    extra.

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

        if paired and rule == "closed":
            # Cross-SEGMENT pairing: the closed form has no node loop to
            # pair within, so its three divides are shared across two
            # consecutive segments instead (3 per 2 segments vs 6).
            o_ref[:] = w_ref[:] * _closed_paired_sum(
                ax_ref, ay_ref, az_ref, ux_ref, uy_ref, uz_ref,
                ll_ref, ii_ref, start, count, radius, px, py, pz,
            )
            return

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

            node_nq, scale = _quad_nodes_nq(
                rule, nodes, (dx, dy, dz), (ux, uy, uz), b, ll, radius
            )
            total = _node_sum(node_nq, nodes, paired, acc)
            return acc + ii * scale * total

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
                    pz_ref, w_ref, o_ref, *, paired: bool = False):
    """Analytic VRL: closed-form line integral per (sample, segment).

    The reference discretizes each RayLight segment every lightRayStepSize
    into point lights of I/steps (ray_compute_color.comp:11-24) — a Riemann
    sum of I/(4 pi L) * integral_0^L ds / d(s)^2 with
    d(s)^2 = s^2 - 2 b s + c, b = (p-a).u:

        integral = [atan((L-b)/q) + atan(b/q)] / q = dtheta / q,
        q = closest-approach distance (|d x u|, cancellation-free)

    evaluated as dtheta * rsqrt(q^2) with dtheta from the tangent-
    difference identity (_subtended_angle): one _atan and one divide per
    (sample, segment) instead of two and three, and no small-angle
    cancellation.  One evaluation per SEGMENT instead of per sub-light —
    typically 30-100x fewer terms at default lightRayStepSize.
    Approximation mode (not bit-parity): it is the h->0 limit of the
    reference's sum.

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

        if paired:
            o_ref[:] = w_ref[:] * _vrl_paired_sum(
                ax_ref, ay_ref, az_ref, ux_ref, uy_ref, uz_ref,
                ll_ref, ii_ref, start, count, px, py, pz,
            )
            return

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
            q2 = _cross_q2((dx, dy, dz), (ux, uy, uz))
            iq = jax.lax.rsqrt(q2)
            integral = _subtended_angle(b, q2, q2 * iq, ll) * iq
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
    quad_rule: str = "midpoint",
    paired: bool = False,
    interpret: bool = False,
):
    """Analytic/quadrature segment gather over raw segments (no expansion).

    px/py/pz: (M, 128) world coords (padded to TILE_M blocks);
    segments: (L,) arrays; valid must be a contiguous prefix/range.
    ``sphere_radius=None``: closed-form VRL (point sub-lights);
    otherwise: ``quad_nodes``-point quadrature of the VBL sphere-light
    integrand under ``quad_rule`` ("midpoint" in s, or Gauss-Legendre in
    the "tangent"-transformed variable — see _quad_nodes_nq).  Returns
    (M, 128) radiance sums equal to the h->0 limit of the reference's
    per-sub-light sum.
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
            functools.partial(_segment_kernel, paired=paired),
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
    eff_nodes = effective_quad_nodes(quad_rule, quad_nodes)
    return pl.pallas_call(
        functools.partial(_segment_sphere_kernel, nodes=eff_nodes,
                          paired=paired, rule=quad_rule),
        grid=grid,
        in_specs=[smem()] * 11 + [spec()] * 4,
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(15 + (50 if quad_rule == "closed" else 7 * eff_nodes))
            * M * 128 * max(L, 1),
            bytes_accessed=4 * M * 128 * 4,
            transcendentals=(1 if quad_rule == "closed"
                             else eff_nodes + (2 if quad_rule == "tangent"
                                               else 0)) * M * 128 * L,
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
