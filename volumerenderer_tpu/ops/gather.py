"""Many-light radiance gather — the hot op of the four gather algorithms.

The reference's per-pixel ``for i in lightCount`` loop
(point_compute_color.comp:9-15 etc.) becomes one batched (samples x lights)
contraction.  Three interchangeable implementations:

  * ``xla``    — light-chunked lax.scan; bounded intermediates; runs anywhere
                 (the test/CPU reference path).
  * ``mxu``    — Pallas TPU kernel (ops/pallas/gather_kernel.py): the squared
                 distance matrix comes off the MXU as a K=8 matmul
                 d^2 = |p|^2 + |l|^2 - 2 p.l, the 1/(4 pi d^2) epilogue and
                 light-axis reduction stay in VMEM.  ~3x fewer VPU ops/pair
                 than the difference form; distances are computed in
                 volume-centered coordinates to bound the cancellation error
                 of the matmul form.
  * ``auto``   — mxu on TPU, xla elsewhere.

All variants compute scalar (white-light) radiance sums:
  point:   sum_l I_l / (4 pi |p - l|^2)        with |.|^2 < 1e-4 -> 0
  sphere:  sum_l I_l / (4 pi (|p - c_l| - r)^2) same guard, center-hit -> 0
(common_functions.h:186-201).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lights import FOUR_PI, GUARD


def _xla_chunk_point(samples, l_pos, l_int):
    d2 = jnp.sum((samples[:, None, :] - l_pos[None, :, :]) ** 2, axis=-1)
    c = l_int[None, :] / (FOUR_PI * d2)
    return jnp.sum(jnp.where(d2 < GUARD, 0.0, c), axis=-1)


def _xla_chunk_sphere(samples, l_pos, l_int, radius):
    diff = samples[:, None, :] - l_pos[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    d2 = (dist - radius) ** 2
    c = l_int[None, :] / (FOUR_PI * d2)
    return jnp.sum(
        jnp.where((d2 < GUARD) | (dist == 0.0), 0.0, c), axis=-1
    )


def gather_xla(
    samples, l_pos, l_int, l_valid, *, sphere: bool, radius=0.0,
    light_chunk: int = 512,
):
    """Chunked reference implementation. samples (N,3) -> (N,) radiance."""
    L = l_pos.shape[0]
    l_int = jnp.where(l_valid, l_int, 0.0)
    # Park invalid lights far away so their (zero-intensity) terms cannot
    # trip the d^2 guard at a real sample position.
    l_pos = jnp.where(l_valid[:, None], l_pos, 1e15)
    if L <= light_chunk:
        fn = _xla_chunk_sphere if sphere else _xla_chunk_point
        args = (samples, l_pos, l_int) + ((radius,) if sphere else ())
        return fn(*args)
    pad = (-L) % light_chunk
    l_pos = jnp.concatenate([l_pos, jnp.full((pad, 3), 1e15, l_pos.dtype)])
    l_int = jnp.concatenate([l_int, jnp.zeros((pad,), l_int.dtype)])
    n_chunks = (L + pad) // light_chunk
    lp = l_pos.reshape(n_chunks, light_chunk, 3)
    li = l_int.reshape(n_chunks, light_chunk)

    def body(acc, chunk):
        cp, ci = chunk
        if sphere:
            return acc + _xla_chunk_sphere(samples, cp, ci, radius), None
        return acc + _xla_chunk_point(samples, cp, ci), None

    acc, _ = jax.lax.scan(body, jnp.zeros(samples.shape[0]), (lp, li))
    return acc


def gather(
    samples,
    l_pos,
    l_int,
    l_valid,
    *,
    sphere: bool,
    radius=0.0,
    impl: str = "auto",
    center=None,
):
    """Dispatch to the fastest available implementation.

    ``center``: optional (3,) coordinate-frame shift for the MXU path
    (typically the volume center); invariant for the result.
    """
    if impl == "auto":
        impl = "mxu" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return gather_xla(
            samples, l_pos, l_int, l_valid, sphere=sphere, radius=radius
        )
    from .pallas.gather_kernel import gather_mxu

    return gather_mxu(
        samples,
        l_pos,
        l_int,
        l_valid,
        sphere=sphere,
        radius=radius,
        center=center,
        interpret=impl == "mxu_interpret",
    )


def gather_planes(
    px,
    py,
    pz,
    weight,
    l_pos,
    l_int,
    l_valid,
    *,
    sphere: bool,
    radius=0.0,
    impl: str = "auto",
    center=None,
    layout: str = "slots",
    lane_need=None,
    paired: bool = False,
):
    """Gather over SoA world-coordinate planes px/py/pz.

    ``layout="slots"``: planes are (R, C) per-ray sample rows; returns
    (R, C) WEIGHTED radiance sums (weight * sum over lights), whole zero
    blocks skipped by the TPU kernels.
    ``layout="lanes"``: planes are transposed (Cp, Rc) lane-per-ray
    (render.color.CompactView); returns (Rc,) per-ray sums
    ``sum_samples(w * sum_lights)`` reduced inside the kernel.
    Requires the valid light slots to form one contiguous range (true for
    photon lights, compacted segment expansions, and light-axis shards).
    ``paired=True``: one divide per 4 lights in the VPU/lane kernels
    (config.gather_eval="paired"; reassociation-only deviation <= 3e-5
    relative) — ignored by the XLA oracle and the MXU large-L path.
    """
    from .pallas import gather_vpu as vpu_mod

    interpret = impl.endswith("_interpret")
    base = impl.replace("_interpret", "")
    if base == "auto":
        base = "vpu" if jax.default_backend() == "tpu" else "xla"
    L = l_pos.shape[0]
    if base == "vpu" and L > vpu_mod.SMEM_LIGHT_LIMIT:
        base = "mxu"

    if base in ("xla", "mxu"):
        samples = jnp.stack(
            [px.reshape(-1), py.reshape(-1), pz.reshape(-1)], axis=-1
        )
        if base == "xla":
            rad = gather_xla(
                samples, l_pos, l_int, l_valid, sphere=sphere, radius=radius
            )
        else:
            from .pallas.gather_kernel import gather_mxu

            rad = gather_mxu(
                samples, l_pos, l_int, l_valid, sphere=sphere,
                radius=radius, center=center, interpret=interpret,
            )
        weighted = weight * rad.reshape(px.shape)
        if layout == "lanes":
            return jnp.sum(weighted, axis=0)
        return weighted

    valid_i = l_valid.astype(jnp.int32)
    count = jnp.sum(valid_i)
    start = jnp.argmax(valid_i)  # first valid slot (0 if none; count==0 then)
    if layout == "lanes":
        from .pallas import gather_lanes as lanes_mod

        return lanes_mod.gather_lanes(
            px, py, pz, weight, l_pos, l_int, start, count,
            sphere=sphere, radius=radius, lane_need=lane_need,
            paired=paired, interpret=interpret,
        )
    # VPU kernel: (M, 128) planes, padded up to TILE_M block granularity.
    R, C = px.shape
    pxm, pym, pzm, wm, block_active, M = _plane_blocks(px, py, pz, weight)
    out = vpu_mod.gather_vpu(
        pxm, pym, pzm, wm, block_active, l_pos, l_int, start, count,
        sphere=sphere, radius=radius, paired=paired, interpret=interpret,
    )
    return out[:M].reshape(R, C)


def _plane_blocks(px, py, pz, weight):
    """Reshape (R, C) planes into TILE_M-padded (M, 128) blocks + skip flags."""
    from .pallas import gather_vpu as vpu_mod

    R, C = px.shape
    N = R * C
    assert N % 128 == 0, (R, C)
    M = N // 128
    pad_m = (-M) % vpu_mod.TILE_M
    shape = lambda a: jnp.pad(a.reshape(M, 128), ((0, pad_m), (0, 0)))
    pxm, pym, pzm, wm = shape(px), shape(py), shape(pz), shape(weight)
    n_blocks = (M + pad_m) // vpu_mod.TILE_M
    block_active = (
        jnp.any(wm.reshape(n_blocks, vpu_mod.TILE_M * 128) != 0.0, axis=1)
    ).astype(jnp.int32)
    return pxm, pym, pzm, wm, block_active, M


def segment_integral_xla(samples, pos_from, pos_to, intensity, valid):
    """Closed-form VRL line integral, XLA reference path.

    Equals the h->0 limit of the reference's per-sub-light Riemann sum
    (ray_compute_color.comp:11-24): I/(4 pi L) * int_0^L ds/d^2(s).
    samples (N, 3) -> (N,) radiance.
    """
    seg = pos_to - pos_from
    length = jnp.linalg.norm(seg, axis=-1)
    safe = jnp.where(length > 0, length, 1.0)
    u = seg / safe[:, None]
    ii = jnp.where(valid & (length > 0), intensity / (FOUR_PI * safe), 0.0)
    d = samples[:, None, :] - pos_from[None, :, :]  # (N, L, 3)
    b = jnp.sum(d * u[None, :, :], axis=-1)
    # Cancellation-free q^2 and subtended angle (see gather_vpu._cross_q2
    # and _subtended_angle): integral = dtheta / q.
    cross = jnp.cross(d, u[None, :, :])
    q2 = jnp.maximum(jnp.sum(cross * cross, axis=-1), GUARD)
    q = jnp.sqrt(q2)
    ll = length[None, :]
    den = q2 - b * (ll - b)
    ad = jnp.arctan(ll * q / jnp.where(den == 0.0, 1e-30, den))
    dt = jnp.where(den >= 0.0, ad, ad + jnp.float32(3.1415927410125732))
    return jnp.sum(ii[None, :] * (dt / q), axis=-1)


def segment_sphere_quadrature_xla(
    samples, pos_from, pos_to, intensity, valid, radius, nodes: int,
    rule: str = "midpoint",
):
    """Quadrature of the VBL sphere-light integrand, XLA reference path
    (matches ops/pallas/gather_vpu._segment_sphere_kernel): composite
    midpoint in s, Gauss-Legendre in the tangent-transformed variable
    (rule="tangent"), or the exact closed-form antiderivative
    (rule="closed"; see gather_vpu._quad_nodes_nq for both derivations —
    this oracle uses exact transcendentals where the kernel uses its
    polynomial _atan).  The closed branch here deliberately keeps the
    UNrescaled normalized-trig antiderivative (id0/id1, c0/s0/c1/s1): the
    kernel's round-4 d0*d1-rescaled evaluation must agree with it to
    polynomial-atan tolerance, so the oracle doubles as an independent
    check of that algebra (tests/test_gather.py::
    test_beam_closed_kernel_matches_xla)."""
    seg = pos_to - pos_from
    length = jnp.linalg.norm(seg, axis=-1)
    safe = jnp.where(length > 0, length, 1.0)
    u = seg / safe[:, None]
    ii = jnp.where(valid & (length > 0), intensity / (FOUR_PI * safe), 0.0)
    d = samples[:, None, :] - pos_from[None, :, :]
    b = jnp.sum(d * u[None, :, :], axis=-1)
    c = jnp.sum(d * d, axis=-1)
    if rule == "closed":
        r = jnp.float32(radius)
        cross = jnp.cross(d, u[None, :, :])
        q2 = jnp.maximum(jnp.sum(cross * cross, axis=-1), GUARD)
        qc = jnp.maximum(jnp.sqrt(q2), r * jnp.float32(1.015625))
        qc2 = qc * qc
        ll = length[None, :]
        lb = ll - b
        d02 = qc2 + b * b
        d12 = qc2 + lb * lb
        id0 = jax.lax.rsqrt(d02)
        id1 = jax.lax.rsqrt(d12)
        c0 = qc * id0
        s0 = -b * id0
        c1 = qc * id1
        s1 = lb * id1
        sindt = qc * ll * id0 * id1
        direct = lb * id1 + b * id0
        den_c = lb * (d02 * id0) - b * (d12 * id1)
        conj = (
            qc2 * ll * (ll - 2.0 * b) * id0 * id1
            / jnp.where(den_c == 0.0, 1e-30, den_c)
        )
        ds = jnp.where((b >= 0.0) & (b <= ll), direct, conj)
        A = (qc - r) * (qc + r)
        irA = jax.lax.rsqrt(A)
        kappa = (qc + r) * irA
        n_r = (r * (irA * irA)) * (qc * ds - r * sindt)
        q_r = (qc - r * c0) * (qc - r * c1)
        numt = kappa * (ds + sindt)
        dent = (1.0 + c0) * (1.0 + c1) + (kappa * kappa) * (s1 * s0)
        ang = jnp.arctan(numt / jnp.where(dent == 0.0, 1e-30, dent))
        ang = jnp.where(dent < 0.0, ang + jnp.float32(3.1415927410125732),
                        ang)
        total = n_r / q_r + (2.0 * qc) * (irA * irA * irA) * ang
        return jnp.sum(ii[None, :] * (qc * total), axis=-1)
    if rule == "tangent":
        from .pallas.gather_vpu import _gauss01

        xs, ws = _gauss01(nodes)
        # Cancellation-free q^2 = |d x u|^2 (matches _quad_nodes_nq).
        cross = jnp.cross(d, u[None, :, :])
        q2 = jnp.maximum(jnp.sum(cross * cross, axis=-1), GUARD)
        q = jnp.sqrt(q2)
        t0 = jnp.arctan(-b / q)
        # Cancellation-free dtheta (matches _quad_nodes_nq): tangent-
        # difference identity instead of a difference of two arctans.
        ll = length[None, :]
        den = q2 - b * (ll - b)
        ad = jnp.arctan(ll * q / jnp.where(den == 0.0, 1e-30, den))
        dt = jnp.where(den >= 0.0, ad, ad + jnp.float32(3.1415927410125732))
        xj = jnp.asarray(xs, jnp.float32)[None, None, :]
        wj = jnp.asarray(ws, jnp.float32)[None, None, :]
        cth = jnp.cos(t0[..., None] + xj * dt[..., None])
        e = q[..., None] - radius * cth
        e2 = e * e
        bad = e2 < GUARD * (cth * cth)
        f = jnp.where(bad, 0.0, wj / e2)  # bad covers e2 ~ 0 (no clamp)
        total = jnp.sum(f, axis=-1) * (dt * q)
        return jnp.sum(ii[None, :] * total, axis=-1)
    s = (jnp.arange(nodes, dtype=jnp.float32) + 0.5) / nodes  # (J,)
    sj = s[None, None, :] * length[None, :, None]  # (1, L, J)
    d2 = jnp.maximum(
        c[..., None] - 2.0 * b[..., None] * sj + sj * sj, 0.0
    )
    dist = jnp.sqrt(d2)
    dd = dist - radius
    d2e = dd * dd
    bad = (d2e < GUARD) | (dist == 0.0)
    f = jnp.where(bad, 0.0, 1.0 / jnp.maximum(d2e, GUARD))
    total = jnp.sum(f, axis=-1) * (length[None, :] / nodes)
    return jnp.sum(ii[None, :] * total, axis=-1)


def segment_discrete_xla(
    samples, pos_from, pos_to, intensity, valid, light_ray_step_size,
    *, sphere_radius=None, max_points_per_segment: int = 512,
):
    """Discrete sub-light sum, independent XLA reference path for tests.

    Materializes the (capped) expansion exactly like the reference's double
    loop semantics (ray_compute_color.comp:11-24) via lights.expand_segments
    and sums point/sphere contributions.  TRUNCATES segments beyond
    ``max_points_per_segment`` sub-lights (static-shape necessity); the
    Pallas kernel (gather_segments_discrete) has no such cap.
    """
    from .lights import expand_segments

    pts, ints, vmask = expand_segments(
        pos_from, pos_to, intensity, valid, light_ray_step_size,
        max_points_per_segment,
    )
    return gather_xla(
        samples, pts, ints, vmask,
        sphere=sphere_radius is not None,
        radius=0.0 if sphere_radius is None else sphere_radius,
    )


def gather_segments_discrete(
    px, py, pz, weight, pos_from, pos_to, intensity, valid,
    light_ray_step_size,
    *, sphere_radius=None, impl: str = "auto",
    max_points_per_segment: int = 512,
    layout: str = "slots",
    lane_need=None,
    paired: bool = False,
):
    """Reference-parity discrete Ray/VRL / Beam/VBL gather over SoA planes.

    Sub-lights are iterated INSIDE the Pallas kernel from the raw segment
    table — no HBM expansion, no per-segment or total sub-light caps
    (the caps/truncation of the old expansion pipeline are gone; see
    gather_vpu._segment_discrete_kernel).  ``impl='xla'`` selects the
    independent capped expansion path (test oracle).  ``layout`` as in
    gather_planes: "slots" -> (R, C) weighted sums, "lanes" -> (Rc,)
    per-ray sums.  ``paired=True``: same sub-light quadrature evaluated
    with one divide per 4 terms (~1.6x faster; <= 3e-5 relative
    reassociation error; Pallas paths only — ignored by the XLA oracle).
    """
    from .pallas import gather_vpu as vpu_mod

    interpret = impl.endswith("_interpret")
    base = impl.replace("_interpret", "")
    if base in ("auto", "mxu", "vpu"):
        if jax.default_backend() == "tpu":
            base = "vpu"
        else:
            # Same kernel semantics everywhere: interpret-mode on CPU.
            base, interpret = "vpu", True
    if base == "xla":
        samples = jnp.stack(
            [px.reshape(-1), py.reshape(-1), pz.reshape(-1)], axis=-1
        )
        out = segment_discrete_xla(
            samples, pos_from, pos_to, intensity, valid,
            light_ray_step_size, sphere_radius=sphere_radius,
            max_points_per_segment=max_points_per_segment,
        )
        weighted = weight * out.reshape(px.shape)
        if layout == "lanes":
            return jnp.sum(weighted, axis=0)
        return weighted
    if layout == "lanes":
        from .pallas import gather_lanes as lanes_mod

        return lanes_mod.gather_segments_discrete_lanes(
            px, py, pz, weight, pos_from, pos_to, intensity, valid,
            light_ray_step_size, sphere_radius=sphere_radius,
            lane_need=lane_need, paired=paired, interpret=interpret,
        )
    R, C = px.shape
    pxm, pym, pzm, wm, block_active, M = _plane_blocks(px, py, pz, weight)
    out = vpu_mod.gather_segments_discrete(
        pxm, pym, pzm, wm, block_active, pos_from, pos_to, intensity, valid,
        light_ray_step_size, sphere_radius=sphere_radius, paired=paired,
        interpret=interpret,
    )
    return out[:M].reshape(R, C)


def gather_segments(
    px, py, pz, weight, pos_from, pos_to, intensity, valid,
    *, impl: str = "auto", sphere_radius=None, quad_nodes: int = 16,
    quad_rule: str = "midpoint",
    layout: str = "slots", lane_need=None,
    paired: bool = False,
):
    """Analytic (VRL) / quadrature (VBL) segment gather over SoA planes.

    ``sphere_radius=None`` -> closed-form point-sub-light line integral;
    otherwise the ``quad_nodes``-point sphere-light quadrature under
    ``quad_rule`` ("midpoint" in s, Gauss-Legendre in the "tangent"-
    transformed variable — strictly more accurate at half the nodes — or
    the exact "closed"-form antiderivative, which ignores ``quad_nodes``;
    see pallas/gather_vpu._quad_nodes_nq).
    ``layout`` as in gather_planes: "slots" -> (R, C) weighted radiance
    (weight folded into the kernel), "lanes" -> (Rc,) per-ray sums.
    ``paired=True`` (segment_eval="paired"; reassociation-only
    deviation): one divide per 4 quadrature nodes in the node-rule VBL
    kernels; for the divide-per-SEGMENT forms (closed-rule VBL, the
    closed-form VRL) segments run two per loop trip with the per-segment
    divides shared across the pair (gather_vpu._closed_paired_sum /
    _vrl_paired_sum).  No effect on the XLA oracle."""
    from .pallas import gather_vpu as vpu_mod

    interpret = impl.endswith("_interpret")
    base = impl.replace("_interpret", "")
    if base in ("auto", "mxu", "vpu"):
        base = "vpu" if (jax.default_backend() == "tpu" or interpret) else "xla"
    if base == "xla":
        samples = jnp.stack(
            [px.reshape(-1), py.reshape(-1), pz.reshape(-1)], axis=-1
        )
        if sphere_radius is None:
            out = segment_integral_xla(
                samples, pos_from, pos_to, intensity, valid
            )
        else:
            out = segment_sphere_quadrature_xla(
                samples, pos_from, pos_to, intensity, valid, sphere_radius,
                quad_nodes, rule=quad_rule,
            )
        weighted = weight * out.reshape(px.shape)
        if layout == "lanes":
            return jnp.sum(weighted, axis=0)
        return weighted
    if layout == "lanes":
        from .pallas import gather_lanes as lanes_mod

        return lanes_mod.gather_segments_analytic_lanes(
            px, py, pz, weight, pos_from, pos_to, intensity, valid,
            sphere_radius=sphere_radius, quad_nodes=quad_nodes,
            quad_rule=quad_rule,
            lane_need=lane_need, paired=paired, interpret=interpret,
        )
    R, C = px.shape
    pxm, pym, pzm, wm, block_active, M = _plane_blocks(px, py, pz, weight)
    out = vpu_mod.gather_segments_analytic(
        pxm, pym, pzm, wm, block_active, pos_from, pos_to, intensity, valid,
        sphere_radius=sphere_radius, quad_nodes=quad_nodes,
        quad_rule=quad_rule, paired=paired,
        interpret=interpret,
    )
    return out[:M].reshape(R, C)
