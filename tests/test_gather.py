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
