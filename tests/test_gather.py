"""Gather implementations: chunked XLA vs direct, Pallas kernel (interpret
mode) vs XLA, and light compaction."""

import numpy as np
import jax.numpy as jnp

from volumerenderer_tpu.ops import gather, lights as L


def scene(n=700, nl=900, seed=16):
    rs = np.random.RandomState(seed)
    samples = (rs.randn(n, 3) * 8 + 15).astype(np.float32)
    lpos = (rs.randn(nl, 3) * 8 + 15).astype(np.float32)
    lint = (rs.rand(nl) * 20).astype(np.float32)
    valid = rs.rand(nl) < 0.8
    return map(jnp.asarray, (samples, lpos, lint, valid))


def test_chunked_xla_matches_direct():
    samples, lpos, lint, valid = scene()
    direct = L.gather_point_lights(samples, lpos, lint, valid)
    chunked = gather.gather_xla(
        samples, lpos, lint, valid, sphere=False, light_chunk=128
    )
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(direct), rtol=1e-5)

    direct_s = L.gather_sphere_lights(samples, lpos, lint, valid, 0.3)
    chunked_s = gather.gather_xla(
        samples, lpos, lint, valid, sphere=True, radius=0.3, light_chunk=128
    )
    np.testing.assert_allclose(
        np.asarray(chunked_s), np.asarray(direct_s), rtol=1e-4
    )


def test_mxu_kernel_interpret_matches_xla():
    samples, lpos, lint, valid = scene(n=300, nl=200)
    center = jnp.float32([15.0, 15.0, 15.0])
    for sphere in (False, True):
        want = gather.gather_xla(
            samples, lpos, lint, valid, sphere=sphere, radius=0.3
        )
        got = gather.gather(
            samples,
            lpos,
            lint,
            valid,
            sphere=sphere,
            radius=0.3,
            impl="mxu_interpret",
            center=center,
        )
        # matmul-form cancellation bounds accuracy; centered coords keep the
        # relative error of the per-sample sums tight.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-5
        )


def test_compact_valid():
    rs = np.random.RandomState(17)
    pos = rs.randn(50, 3).astype(np.float32)
    inten = rs.rand(50).astype(np.float32)
    valid = rs.rand(50) < 0.5
    cpos, cint, cvalid, dropped = L.compact_valid(
        jnp.asarray(pos), jnp.asarray(inten), jnp.asarray(valid), 64
    )
    nv = int(valid.sum())
    assert int(cvalid.sum()) == nv and int(dropped) == 0
    np.testing.assert_allclose(np.asarray(cpos)[:nv], pos[valid])
    np.testing.assert_allclose(np.asarray(cint)[:nv], inten[valid])
    # Overflow: capacity 4.
    cpos, cint, cvalid, dropped = L.compact_valid(
        jnp.asarray(pos), jnp.asarray(inten), jnp.asarray(valid), 4
    )
    assert int(cvalid.sum()) == 4 and int(dropped) == nv - 4
    np.testing.assert_allclose(np.asarray(cpos), pos[valid][:4])


def test_gather_planes_vpu_interpret_matches_xla():
    import jax.numpy as jnp
    from volumerenderer_tpu.ops.gather import gather_planes

    rs = np.random.RandomState(22)
    R, C = 64, 32  # R*C = 2048, divisible by 128
    px = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    w = jnp.asarray((rs.rand(R, C) > 0.3).astype(np.float32))
    lpos = jnp.asarray((rs.randn(40, 3) * 8 + 15).astype(np.float32))
    lint = jnp.asarray((rs.rand(40) * 20).astype(np.float32))
    valid = jnp.arange(40) < 25
    for sphere in (False, True):
        want = gather_planes(px, py, pz, w, lpos, lint, valid,
                             sphere=sphere, radius=0.3, impl="xla")
        got = gather_planes(px, py, pz, w, lpos, lint, valid,
                            sphere=sphere, radius=0.3,
                            impl="vpu_interpret")
        # Outputs are weight-folded: want already includes the weight.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-6)


def test_gather_planes_zero_lights():
    import jax.numpy as jnp
    from volumerenderer_tpu.ops.gather import gather_planes

    px = jnp.ones((16, 8)); py = px; pz = px
    w = jnp.ones((16, 8))
    lpos = jnp.zeros((4, 3)); lint = jnp.zeros((4,))
    valid = jnp.zeros((4,), bool)
    out = gather_planes(px, py, pz, w, lpos, lint, valid,
                        sphere=False, impl="vpu_interpret")
    assert float(jnp.abs(out).max()) == 0.0


def test_analytic_segment_integral_matches_fine_discretization():
    import jax.numpy as jnp
    from volumerenderer_tpu.ops.gather import segment_integral_xla

    rs = np.random.RandomState(23)
    samples = jnp.asarray((rs.randn(50, 3) * 5).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(6, 3) * 5 + 10).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(6, 3) * 5 + 10).astype(np.float32))
    inten = jnp.asarray((rs.rand(6) * 30).astype(np.float32))
    valid = jnp.asarray([True] * 5 + [False])

    analytic = np.asarray(segment_integral_xla(
        samples, pos_from, pos_to, inten, valid))

    # Very fine discretization of the reference's sub-light sum.
    pts, ints, vmask = L.expand_segments(
        pos_from, pos_to, inten, valid, 0.002, 20000)
    fine = np.asarray(L.gather_point_lights(samples, pts, ints, vmask))
    np.testing.assert_allclose(analytic, fine, rtol=2e-3)


def test_gather_segments_kernel_matches_xla():
    import jax.numpy as jnp
    from volumerenderer_tpu.ops.gather import gather_segments

    rs = np.random.RandomState(24)
    R, C = 64, 32
    px = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    w = jnp.ones((R, C), jnp.float32)
    pos_from = jnp.asarray((rs.randn(8, 3) * 8 + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(8, 3) * 8 + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(8) * 30).astype(np.float32))
    valid = jnp.arange(8) < 6
    want = gather_segments(px, py, pz, w, pos_from, pos_to, inten, valid,
                           impl="xla")
    got = gather_segments(px, py, pz, w, pos_from, pos_to, inten, valid,
                          impl="vpu_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-6)


def test_beam_quadrature_matches_fine_discretization():
    import jax.numpy as jnp
    from volumerenderer_tpu.ops.gather import segment_sphere_quadrature_xla

    rs = np.random.RandomState(25)
    samples = jnp.asarray((rs.randn(40, 3) * 5).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(5, 3) * 5 + 12).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(5, 3) * 5 + 12).astype(np.float32))
    inten = jnp.asarray((rs.rand(5) * 30).astype(np.float32))
    valid = jnp.asarray([True] * 5)
    r = 0.3
    quad = np.asarray(segment_sphere_quadrature_xla(
        samples, pos_from, pos_to, inten, valid, r, nodes=256))
    pts, ints, vmask = L.expand_segments(
        pos_from, pos_to, inten, valid, 0.005, 8192)
    fine = np.asarray(L.gather_sphere_lights(samples, pts, ints, vmask, r))
    np.testing.assert_allclose(quad, fine, rtol=5e-3)


def test_beam_quadrature_kernel_matches_xla():
    import jax.numpy as jnp
    from volumerenderer_tpu.ops.gather import gather_segments

    rs = np.random.RandomState(26)
    R, C = 64, 32
    px = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    w = jnp.ones((R, C), jnp.float32)
    pos_from = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(6) * 30).astype(np.float32))
    valid = jnp.arange(6) < 5
    want = gather_segments(px, py, pz, w, pos_from, pos_to, inten, valid,
                           impl="xla", sphere_radius=0.25, quad_nodes=8)
    got = gather_segments(px, py, pz, w, pos_from, pos_to, inten, valid,
                          impl="vpu_interpret", sphere_radius=0.25,
                          quad_nodes=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-6)


def _seg_scene(seed, nseg=8, spread=8.0):
    rs = np.random.RandomState(seed)
    R, C = 64, 32
    px = jnp.asarray((rs.randn(R, C) * spread + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * spread + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * spread + 15).astype(np.float32))
    w = jnp.asarray((rs.rand(R, C) > 0.2).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(nseg, 3) * spread + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(nseg, 3) * spread + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(nseg) * 30).astype(np.float32))
    valid = jnp.arange(nseg) < nseg - 2
    return px, py, pz, w, pos_from, pos_to, inten, valid


def test_discrete_segment_kernel_matches_expansion_xla():
    """In-kernel discrete sub-light sum == capped expansion oracle when the
    caps don't bind (Ray point sub-lights and Beam sphere sub-lights)."""
    from volumerenderer_tpu.ops.gather import gather_segments_discrete

    px, py, pz, w, pos_from, pos_to, inten, valid = _seg_scene(27)
    for radius in (None, 0.25):
        want = gather_segments_discrete(
            px, py, pz, w, pos_from, pos_to, inten, valid, 0.3,
            sphere_radius=radius, impl="xla", max_points_per_segment=4096)
        got = gather_segments_discrete(
            px, py, pz, w, pos_from, pos_to, inten, valid, 0.3,
            sphere_radius=radius, impl="vpu_interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-6)


def test_discrete_segment_kernel_bitequal_expanded_vpu():
    """Same per-pair math and summation order as the expansion + VPU-kernel
    pipeline -> bit-identical outputs when the expansion caps don't bind.

    On real TPU (Mosaic) the two are exactly bit-equal (verified on-chip;
    scripts/acceptance.py re-checks).  The CPU interpret path differs only
    by LLVM contracting the scalar sub-light position `ax + sf*ux` into a
    single-rounded FMA (optimization_barrier does not reach LLVM codegen),
    so off-TPU this asserts ulp-tight closeness instead.
    """
    import jax

    from volumerenderer_tpu.ops.gather import (
        gather_planes, gather_segments_discrete)

    on_tpu = jax.default_backend() == "tpu"
    impl = "vpu" if on_tpu else "vpu_interpret"
    px, py, pz, w, pos_from, pos_to, inten, valid = _seg_scene(28, nseg=6)
    step = 0.4
    for radius in (None, 0.2):
        pts, ints, vmask = L.expand_segments(
            pos_from, pos_to, inten, valid, step, 512)
        # Capacity <= SMEM_LIGHT_LIMIT so gather_planes stays on the VPU
        # kernel (same summation order as the in-kernel discrete loop).
        cpos, cint, cvalid, dropped = L.compact_valid(
            pts, ints, vmask, 2048)
        assert int(dropped) == 0
        want = gather_planes(
            px, py, pz, w, cpos, cint, cvalid,
            sphere=radius is not None, radius=0.0 if radius is None else radius,
            impl=impl)
        got = gather_segments_discrete(
            px, py, pz, w, pos_from, pos_to, inten, valid, step,
            sphere_radius=radius, impl=impl)
        if on_tpu:
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        else:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-7)


def test_discrete_segment_kernel_is_uncapped():
    """A segment longer than max_points_per_segment sub-lights: the old
    expansion truncates (dimming the image, ADVICE r1); the in-kernel path
    sums every sub-light of the reference semantics."""
    from volumerenderer_tpu.ops.gather import gather_segments_discrete

    px = jnp.full((8, 16), 30.0); py = jnp.full((8, 16), 2.0)
    pz = jnp.full((8, 16), 1.0)
    w = jnp.ones((8, 16), jnp.float32)
    pos_from = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    pos_to = jnp.asarray([[60.0, 0.0, 0.0]], jnp.float32)  # 200 sub-lights @0.3
    inten = jnp.asarray([50.0], jnp.float32)
    valid = jnp.asarray([True])
    capped = gather_segments_discrete(
        px, py, pz, w, pos_from, pos_to, inten, valid, 0.3,
        impl="xla", max_points_per_segment=64)
    full = gather_segments_discrete(
        px, py, pz, w, pos_from, pos_to, inten, valid, 0.3,
        impl="xla", max_points_per_segment=4096)
    got = gather_segments_discrete(
        px, py, pz, w, pos_from, pos_to, inten, valid, 0.3,
        impl="vpu_interpret")
    assert float(full.min()) > float(capped.max())  # truncation dims
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-4, atol=1e-6)


def test_discrete_segment_kernel_zero_and_short_segments():
    from volumerenderer_tpu.ops.gather import gather_segments_discrete

    px = jnp.full((8, 16), 5.0); py = px; pz = px
    w = jnp.ones((8, 16), jnp.float32)
    # Segment shorter than one light step -> steps==0 -> no contribution
    # (the reference loop body never runs); plus a zero-length segment.
    pos_from = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], jnp.float32)
    pos_to = jnp.asarray([[0.1, 0.0, 0.0], [1.0, 1.0, 1.0]], jnp.float32)
    inten = jnp.asarray([10.0, 10.0], jnp.float32)
    valid = jnp.asarray([True, True])
    out = gather_segments_discrete(
        px, py, pz, w, pos_from, pos_to, inten, valid, 0.3,
        impl="vpu_interpret")
    assert float(jnp.abs(out).max()) == 0.0


def test_discrete_segment_kernel_paired_matches_exact():
    """segment_eval="paired" (one divide per 4 sub-lights, rational
    combination) computes the same sub-light quadrature as the bit-parity
    evaluation to reassociation error (measured <= 3e-5 relative; the
    guarded/overrun q=PAIR_BIG terms contribute <= 1e-9 each)."""
    from volumerenderer_tpu.ops.gather import gather_segments_discrete

    px, py, pz, w, pos_from, pos_to, inten, valid = _seg_scene(29)
    for radius in (None, 0.25):
        exact = gather_segments_discrete(
            px, py, pz, w, pos_from, pos_to, inten, valid, 0.3,
            sphere_radius=radius, impl="vpu_interpret")
        fast = gather_segments_discrete(
            px, py, pz, w, pos_from, pos_to, inten, valid, 0.3,
            sphere_radius=radius, impl="vpu_interpret", paired=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   rtol=2e-4, atol=1e-6)


def test_discrete_segment_kernel_paired_lanes_layout():
    """Paired evaluation in the lane-per-ray layout (the CompactView hot
    path) agrees with the exact lanes kernel and with the slots layout."""
    from volumerenderer_tpu.ops.gather import gather_segments_discrete

    rs = np.random.RandomState(30)
    Cp, Rc = 16, 1024
    px = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    w = jnp.asarray((rs.rand(Cp, Rc) > 0.2).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(5, 3) * 8 + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(5, 3) * 8 + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(5) * 30).astype(np.float32))
    valid = jnp.arange(5) < 4
    for radius in (None, 0.25):
        exact = gather_segments_discrete(
            px, py, pz, w, pos_from, pos_to, inten, valid, 0.3,
            sphere_radius=radius, impl="vpu_interpret", layout="lanes")
        fast = gather_segments_discrete(
            px, py, pz, w, pos_from, pos_to, inten, valid, 0.3,
            sphere_radius=radius, impl="vpu_interpret", layout="lanes",
            paired=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   rtol=2e-4, atol=1e-5)


def test_point_sphere_paired_matches_exact_slots():
    """gather_eval="paired" for Point/Sphere (one divide per 4 lights,
    rational combination with per-term numerators) agrees with the
    bit-parity light loop to reassociation error.  count=25 is not a
    multiple of 4, so the overrun lanes (n=0, q=1, clamped SMEM index)
    are exercised; a sample placed exactly at a light exercises the
    guard's exact-zero contribution."""
    from volumerenderer_tpu.ops.gather import gather_planes

    rs = np.random.RandomState(31)
    R, C = 64, 32
    px = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    w = jnp.asarray((rs.rand(R, C) > 0.3).astype(np.float32))
    lpos = np.asarray((rs.randn(40, 3) * 8 + 15).astype(np.float32))
    # Guard path: sample (0, 0) sits exactly on light 3.
    lpos[3] = (float(px[0, 0]), float(py[0, 0]), float(pz[0, 0]))
    lpos = jnp.asarray(lpos)
    lint = jnp.asarray((rs.rand(40) * 20).astype(np.float32))
    valid = jnp.arange(40) < 25
    for sphere in (False, True):
        exact = gather_planes(px, py, pz, w, lpos, lint, valid,
                              sphere=sphere, radius=0.3,
                              impl="vpu_interpret")
        fast = gather_planes(px, py, pz, w, lpos, lint, valid,
                             sphere=sphere, radius=0.3,
                             impl="vpu_interpret", paired=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   rtol=2e-4, atol=1e-6)


def test_point_sphere_paired_lanes_layout():
    """Paired Point/Sphere in the lane-per-ray layout (the CompactView
    headline path) agrees with the exact lanes kernel."""
    from volumerenderer_tpu.ops.gather import gather_planes

    rs = np.random.RandomState(32)
    Cp, Rc = 16, 1024
    px = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    w = jnp.asarray((rs.rand(Cp, Rc) > 0.2).astype(np.float32))
    lpos = jnp.asarray((rs.randn(10, 3) * 8 + 15).astype(np.float32))
    lint = jnp.asarray((rs.rand(10) * 20).astype(np.float32))
    valid = jnp.arange(10) < 7  # non-multiple-of-4 count
    for sphere in (False, True):
        exact = gather_planes(px, py, pz, w, lpos, lint, valid,
                              sphere=sphere, radius=0.3,
                              impl="vpu_interpret", layout="lanes")
        fast = gather_planes(px, py, pz, w, lpos, lint, valid,
                             sphere=sphere, radius=0.3,
                             impl="vpu_interpret", layout="lanes",
                             paired=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   rtol=2e-4, atol=1e-5)


def test_point_paired_zero_lights():
    """count == 0 under pairing: the group loop never runs -> exact zeros
    (matches the exact kernel's empty light range)."""
    from volumerenderer_tpu.ops.gather import gather_planes

    px = jnp.ones((16, 8)); py = px; pz = px
    w = jnp.ones((16, 8))
    lpos = jnp.zeros((4, 3)); lint = jnp.zeros((4,))
    valid = jnp.zeros((4,), bool)
    out = gather_planes(px, py, pz, w, lpos, lint, valid,
                        sphere=False, impl="vpu_interpret", paired=True)
    assert float(jnp.abs(out).max()) == 0.0


def test_beam_quadrature_paired_matches_exact():
    """Paired node evaluation of the VBL quadrature (one divide per 4
    nodes) agrees with the per-node divide to reassociation error in both
    layouts, including a non-multiple-of-4 node count (static padding
    terms are exactly zero)."""
    from volumerenderer_tpu.ops.gather import gather_segments

    rs = np.random.RandomState(33)
    R, C = 64, 32
    px = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    w = jnp.asarray((rs.rand(R, C) > 0.3).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(6) * 30).astype(np.float32))
    valid = jnp.arange(6) < 5
    for nodes in (16, 7):
        exact = gather_segments(
            px, py, pz, w, pos_from, pos_to, inten, valid,
            sphere_radius=0.25, quad_nodes=nodes, impl="vpu_interpret")
        fast = gather_segments(
            px, py, pz, w, pos_from, pos_to, inten, valid,
            sphere_radius=0.25, quad_nodes=nodes, impl="vpu_interpret",
            paired=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   rtol=2e-4, atol=1e-6)

    Cp, Rc = 16, 1024
    pxl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    pyl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    pzl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    wl = jnp.asarray((rs.rand(Cp, Rc) > 0.2).astype(np.float32))
    exact = gather_segments(
        pxl, pyl, pzl, wl, pos_from, pos_to, inten, valid,
        sphere_radius=0.25, impl="vpu_interpret", layout="lanes")
    fast = gather_segments(
        pxl, pyl, pzl, wl, pos_from, pos_to, inten, valid,
        sphere_radius=0.25, impl="vpu_interpret", layout="lanes",
        paired=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-4, atol=1e-5)


def test_beam_tangent_quadrature_beats_midpoint16():
    """Tangent-rule Gauss nodes: 8 nodes measure at least as accurate as
    the 16-node midpoint rule against a fine discretization, per segment,
    across closest-approach regimes (the fast-Beam accuracy claim)."""
    import jax.numpy as jnp
    from volumerenderer_tpu.ops.gather import segment_sphere_quadrature_xla

    rs = np.random.RandomState(77)
    r = 0.3
    # One sample at the origin against many segments spanning q ~ 0.6..80
    # (2r..far): random direction, random offset along the segment.
    n = 200
    q = (10.0 ** (rs.rand(n) * 2.13 - 0.22)).astype(np.float32)
    ln = (rs.rand(n) * 20 + 0.5).astype(np.float32)
    boff = (rs.rand(n) * ln).astype(np.float32)
    # Build segments with closest approach q to the origin: perpendicular
    # offset q along a random unit vector, direction orthogonal to it.
    vperp = rs.randn(n, 3).astype(np.float32)
    vperp /= np.linalg.norm(vperp, axis=1, keepdims=True)
    vdir = rs.randn(n, 3).astype(np.float32)
    vdir -= (vdir * vperp).sum(1, keepdims=True) * vperp
    vdir /= np.linalg.norm(vdir, axis=1, keepdims=True)
    pos_from = q[:, None] * vperp - boff[:, None] * vdir
    pos_to = pos_from + ln[:, None] * vdir
    samples = jnp.zeros((1, 3), jnp.float32)
    inten = jnp.ones((n,), jnp.float32)

    def per_seg(nodes, rule):
        outs = []
        for k in range(n):
            outs.append(float(segment_sphere_quadrature_xla(
                samples, jnp.asarray(pos_from[k:k + 1]),
                jnp.asarray(pos_to[k:k + 1]), inten[:1],
                jnp.asarray([True]), r, nodes, rule=rule)[0]))
        return np.asarray(outs)

    ref = per_seg(4096, "midpoint")
    mid16 = per_seg(16, "midpoint")
    tan8 = per_seg(8, "tangent")
    denom = np.maximum(np.abs(ref), 1e-12)
    err_mid = np.abs(mid16 - ref) / denom
    err_tan = np.abs(tan8 - ref) / denom
    # Strictly better in aggregate and never catastrophically worse.
    assert np.median(err_tan) < np.median(err_mid)
    assert np.percentile(err_tan, 95) < np.percentile(err_mid, 95)
    assert err_tan.max() < max(err_mid.max() * 1.5, 2e-3)
    # And tight in absolute terms away from the guard region.
    assert np.percentile(err_tan, 95) < 1e-3


def _far_from_guard(px, py, pz, pos_from, pos_to, radius, margin=0.05):
    """Weight mask zeroing samples within ``margin`` of any segment's
    sphere-sweep surface (closest approach < r + margin): inside it the
    integrand is near-singular (e = d - r crosses 0 along the segment),
    where a node's value/bad-flag diverges between the kernel's
    polynomial _atan/_cos and the oracle's exact transcendentals — a
    regime the quadrature mode is approximate in under every rule
    (kernel-vs-kernel consistency there is covered by the paired test)."""
    p = np.stack([np.asarray(px).ravel(), np.asarray(py).ravel(),
                  np.asarray(pz).ravel()], axis=-1)
    ok = np.ones(p.shape[0], bool)
    for k in range(pos_from.shape[0]):
        a = np.asarray(pos_from[k])
        seg = np.asarray(pos_to[k]) - a
        ln2 = float(seg @ seg)
        t = np.clip((p - a) @ seg / max(ln2, 1e-12), 0.0, 1.0)
        d = np.linalg.norm(p - a - t[:, None] * seg, axis=-1)
        ok &= d - radius > margin
    return jnp.asarray(ok.astype(np.float32).reshape(np.asarray(px).shape))


def test_beam_tangent_kernel_matches_xla():
    """Pallas tangent-rule kernels (both layouts) == the XLA tangent
    oracle (kernel _atan/_cos polynomials vs transcendentals -> small
    rtol; guard-adjacent samples masked, see _far_from_guard)."""
    from volumerenderer_tpu.ops.gather import gather_segments

    rs = np.random.RandomState(78)
    R, C = 64, 32
    px = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(6) * 30).astype(np.float32))
    valid = jnp.arange(6) < 5
    w = _far_from_guard(px, py, pz, pos_from, pos_to, 0.25)
    want = gather_segments(px, py, pz, w, pos_from, pos_to, inten, valid,
                           impl="xla", sphere_radius=0.25, quad_nodes=8,
                           quad_rule="tangent")
    got = gather_segments(px, py, pz, w, pos_from, pos_to, inten, valid,
                          impl="vpu_interpret", sphere_radius=0.25,
                          quad_nodes=8, quad_rule="tangent")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=1e-6)

    Cp, Rc = 16, 1024
    pxl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    pyl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    pzl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    wl = jnp.asarray((rs.rand(Cp, Rc) > 0.2).astype(np.float32))
    wl = wl * _far_from_guard(pxl, pyl, pzl, pos_from, pos_to, 0.25)
    want_l = gather_segments(pxl, pyl, pzl, wl, pos_from, pos_to, inten,
                             valid, impl="xla", sphere_radius=0.25,
                             quad_nodes=8, quad_rule="tangent",
                             layout="lanes")
    got_l = gather_segments(pxl, pyl, pzl, wl, pos_from, pos_to, inten,
                            valid, impl="vpu_interpret", sphere_radius=0.25,
                            quad_nodes=8, quad_rule="tangent",
                            layout="lanes")
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=5e-4, atol=1e-5)


def test_beam_closed_form_accuracy():
    """The closed-rule antiderivative (rule="closed", one atan, no node
    loop) is tighter than tangent-8 against a fine discretization across
    every nonsingular closest-approach regime (q >= 1.02 r — the kernel
    clamp is r*(1+1/64); inside that the true integral diverges and all
    rules saturate)."""
    import jax.numpy as jnp
    from volumerenderer_tpu.ops.gather import segment_sphere_quadrature_xla

    rs = np.random.RandomState(81)
    r = 0.3
    n = 200
    # q from 1.02 r up to ~2500 r, log-spaced; random segment geometry.
    q = (r * 10.0 ** (rs.rand(n) * 3.4 + np.log10(1.02))).astype(np.float32)
    ln = (rs.rand(n) * 20 + 0.5).astype(np.float32)
    boff = (rs.rand(n) * 3 - 1) * ln  # includes projections outside [0, L]
    vperp = rs.randn(n, 3).astype(np.float32)
    vperp /= np.linalg.norm(vperp, axis=1, keepdims=True)
    vdir = rs.randn(n, 3).astype(np.float32)
    vdir -= (vdir * vperp).sum(1, keepdims=True) * vperp
    vdir /= np.linalg.norm(vdir, axis=1, keepdims=True)
    pos_from = q[:, None] * vperp - boff[:, None] * vdir
    pos_to = pos_from + ln[:, None] * vdir
    samples = jnp.zeros((1, 3), jnp.float32)
    inten = jnp.ones((1,), jnp.float32)

    def per_seg(nodes, rule):
        outs = []
        for k in range(n):
            outs.append(float(segment_sphere_quadrature_xla(
                samples, jnp.asarray(pos_from[k:k + 1]),
                jnp.asarray(pos_to[k:k + 1]), inten,
                jnp.asarray([True]), r, nodes, rule=rule)[0]))
        return np.asarray(outs)

    ref = per_seg(4096, "midpoint")
    tan8 = per_seg(8, "tangent")
    closed = per_seg(2, "closed")
    denom = np.maximum(np.abs(ref), 1e-12)
    err_tan = np.abs(tan8 - ref) / denom
    err_closed = np.abs(closed - ref) / denom
    # Both rules sit at the f32 noise floor (~1e-7) for q >> r; the
    # discriminating regime is near the sphere (q < 2r), where tangent-8
    # degrades to ~1e-3 and the closed form stays ~2e-5 (probe run:
    # q/r in [1.2, 2) tan8 max 1.2e-3 vs closed max 5.2e-5).
    near = q < 2.0 * r
    assert near.sum() >= 10
    assert (np.percentile(err_closed[near], 95)
            <= np.percentile(err_tan[near], 95))
    assert err_closed.max() <= max(err_tan.max(), 1e-5)
    # Absolute bar across ALL regimes incl. guard-adjacent, where the
    # midpoint-4096 reference itself converges slowly (the near-singular
    # integrand limits agreement, not the closed form).
    assert err_closed.max() < 5e-4


def test_beam_closed_kernel_matches_xla():
    """Pallas closed-rule kernels (both layouts) == the XLA closed-form
    oracle.  rtol is looser than the tangent test's: the kernel's
    polynomial _atan error (~2e-5 in angle) is amplified by the
    (q^2 - r^2)^(-3/2) factor for guard-adjacent samples."""
    from volumerenderer_tpu.ops.gather import gather_segments

    rs = np.random.RandomState(82)
    R, C = 64, 32
    px = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(6) * 30).astype(np.float32))
    valid = jnp.arange(6) < 5
    w = _far_from_guard(px, py, pz, pos_from, pos_to, 0.25)
    want = gather_segments(px, py, pz, w, pos_from, pos_to, inten, valid,
                           impl="xla", sphere_radius=0.25, quad_nodes=2,
                           quad_rule="closed")
    got = gather_segments(px, py, pz, w, pos_from, pos_to, inten, valid,
                          impl="vpu_interpret", sphere_radius=0.25,
                          quad_nodes=2, quad_rule="closed")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=1e-5)

    Cp, Rc = 32, 1024
    pxl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    pyl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    pzl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    wl = jnp.asarray((rs.rand(Cp, Rc) > 0.2).astype(np.float32))
    wl = wl * _far_from_guard(pxl, pyl, pzl, pos_from, pos_to, 0.25)
    want_l = gather_segments(pxl, pyl, pzl, wl, pos_from, pos_to, inten,
                             valid, impl="xla", sphere_radius=0.25,
                             quad_nodes=2, quad_rule="closed",
                             layout="lanes")
    got_l = gather_segments(pxl, pyl, pzl, wl, pos_from, pos_to, inten,
                            valid, impl="vpu_interpret", sphere_radius=0.25,
                            quad_nodes=2, quad_rule="closed",
                            layout="lanes")
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=3e-3, atol=1e-4)


def test_beam_closed_paired_matches_exact():
    """Paired evaluation of the closed rule's two interface nodes == the
    per-node divide, to reassociation error (the requested quad_nodes is
    ignored for the closed rule — effective_quad_nodes pins 2)."""
    from volumerenderer_tpu.ops.gather import gather_segments

    rs = np.random.RandomState(83)
    R, C = 64, 32
    px = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    w = jnp.asarray((rs.rand(R, C) > 0.3).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(6) * 30).astype(np.float32))
    valid = jnp.arange(6) < 5
    # quad_nodes=16 on purpose: the closed rule must ignore it.
    exact = gather_segments(
        px, py, pz, w, pos_from, pos_to, inten, valid,
        sphere_radius=0.25, quad_nodes=16, quad_rule="closed",
        impl="vpu_interpret")
    fast = gather_segments(
        px, py, pz, w, pos_from, pos_to, inten, valid,
        sphere_radius=0.25, quad_nodes=16, quad_rule="closed",
        impl="vpu_interpret", paired=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-4, atol=1e-6)


def test_beam_tangent_paired_matches_exact():
    """Paired tangent-node evaluation (weights ride the numerators, one
    divide per 4 nodes) == per-node divide, to reassociation error,
    including a non-multiple-of-4 node count."""
    from volumerenderer_tpu.ops.gather import gather_segments

    rs = np.random.RandomState(79)
    R, C = 64, 32
    px = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    w = jnp.asarray((rs.rand(R, C) > 0.3).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(6) * 30).astype(np.float32))
    valid = jnp.arange(6) < 5
    for nodes in (8, 7):
        exact = gather_segments(
            px, py, pz, w, pos_from, pos_to, inten, valid,
            sphere_radius=0.25, quad_nodes=nodes, quad_rule="tangent",
            impl="vpu_interpret")
        fast = gather_segments(
            px, py, pz, w, pos_from, pos_to, inten, valid,
            sphere_radius=0.25, quad_nodes=nodes, quad_rule="tangent",
            impl="vpu_interpret", paired=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                                   rtol=2e-4, atol=1e-6)


def test_cross_segment_paired_closed_and_vrl():
    """The cross-SEGMENT divide pairing (two segments per loop trip with
    the per-segment divides shared — gather_vpu._closed_paired_sum /
    _vrl_paired_sum) agrees with the one-divide-per-segment evaluation to
    reassociation error, in BOTH layouts, for both even and odd live
    segment counts (the odd tail duplicates the last segment with zeroed
    intensity — must contribute exactly nothing)."""
    from volumerenderer_tpu.ops.gather import gather_segments

    rs = np.random.RandomState(101)
    R, C = 64, 32
    px = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    py = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    pz = jnp.asarray((rs.randn(R, C) * 8 + 15).astype(np.float32))
    w = jnp.asarray((rs.rand(R, C) > 0.3).astype(np.float32))
    Cp, Rc = 16, 1024
    pxl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    pyl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    pzl = jnp.asarray((rs.randn(Cp, Rc) * 8 + 15).astype(np.float32))
    wl = jnp.asarray((rs.rand(Cp, Rc) > 0.2).astype(np.float32))
    pos_from = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    pos_to = jnp.asarray((rs.randn(6, 3) * 8 + 15).astype(np.float32))
    inten = jnp.asarray((rs.rand(6) * 30).astype(np.float32))

    for n_live in (4, 5):
        valid = jnp.arange(6) < n_live
        for radius in (0.25, None):  # Beam closed / Ray VRL
            kw = dict(sphere_radius=radius, quad_nodes=16,
                      quad_rule="closed")
            exact = gather_segments(
                px, py, pz, w, pos_from, pos_to, inten, valid,
                impl="vpu_interpret", **kw)
            fast = gather_segments(
                px, py, pz, w, pos_from, pos_to, inten, valid,
                impl="vpu_interpret", paired=True, **kw)
            np.testing.assert_allclose(
                np.asarray(fast), np.asarray(exact), rtol=2e-4, atol=1e-6)
            exact_l = gather_segments(
                pxl, pyl, pzl, wl, pos_from, pos_to, inten, valid,
                impl="vpu_interpret", layout="lanes", **kw)
            fast_l = gather_segments(
                pxl, pyl, pzl, wl, pos_from, pos_to, inten, valid,
                impl="vpu_interpret", layout="lanes", paired=True, **kw)
            np.testing.assert_allclose(
                np.asarray(fast_l), np.asarray(exact_l),
                rtol=2e-4, atol=1e-5)
