"""DenseGrid: sampling, transforms, brick metadata, procedural volumes."""

import numpy as np
import jax.numpy as jnp
import pytest

import reference_impl as ref
from volumerenderer_tpu.grid import BRICK, from_dense, procedural


def small_grid():
    rs = np.random.RandomState(3)
    vals = (rs.rand(10, 12, 9) < 0.4) * rs.rand(10, 12, 9).astype(np.float32)
    return from_dense(vals, bbox_min=(-3, 5, 2), voxel_size=0.7,
                      translation=(1.5, -2.0, 3.0)), vals


def test_padding_and_bbox():
    g, vals = small_grid()
    assert all(s % BRICK == 0 for s in g.voxels.shape)
    np.testing.assert_array_equal(np.asarray(g.bbox_min), [-3, 5, 2])
    np.testing.assert_array_equal(np.asarray(g.bbox_max), [-3 + 9, 5 + 11, 2 + 8])
    # Padded voxels are zero.
    v = np.asarray(g.voxels)
    np.testing.assert_array_equal(v[: vals.shape[0], : vals.shape[1], : vals.shape[2]], vals)
    assert v[vals.shape[0]:].sum() == 0


def test_sample_ijk_matches_oracle():
    g, vals = small_grid()
    gnp = ref.grid_to_np(g)
    rs = np.random.RandomState(4)
    coords = rs.randint(-8, 20, size=(300, 3))
    got = np.asarray(g.sample_ijk(jnp.asarray(coords, jnp.int32)))
    want = np.array([ref.sample_ijk(gnp, c) for c in coords], np.float32)
    np.testing.assert_array_equal(got, want)


def test_transform_roundtrip():
    g, _ = small_grid()
    rs = np.random.RandomState(5)
    p = rs.randn(50, 3).astype(np.float32) * 10
    back = np.asarray(g.world_to_index(g.index_to_world(jnp.asarray(p))))
    np.testing.assert_allclose(back, p, atol=1e-3)


def test_transform_matches_oracle():
    g, _ = small_grid()
    gnp = ref.grid_to_np(g)
    p = np.array([3.7, -1.2, 8.8], np.float32)
    np.testing.assert_allclose(
        np.asarray(g.world_to_index(jnp.asarray(p))),
        ref.world_to_index(gnp, p), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g.index_to_world(jnp.asarray(p))),
        ref.index_to_world(gnp, p), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g.world_to_index_dir(jnp.asarray(p))),
        ref.world_to_index_dir(gnp, p), rtol=1e-6)


def test_brick_occupancy():
    vals = np.zeros((16, 16, 16), np.float32)
    vals[0, 0, 0] = 1.0   # brick (0,0,0)
    vals[9, 9, 9] = 2.0   # brick (1,1,1)
    g = from_dense(vals)
    occ = np.asarray(g.brick_occ)
    assert occ.shape == (2, 2, 2)
    assert occ[0, 0, 0] and occ[1, 1, 1]
    assert occ.sum() == 2
    assert np.asarray(g.brick_max)[1, 1, 1] == 2.0


def test_trilinear_at_voxel_centers():
    g, vals = small_grid()
    # At a voxel center the trilinear value equals the voxel value.
    ijk = np.array([2, 3, 4])
    pos = (np.asarray(g.bbox_min) + ijk + 0.5).astype(np.float32)
    got = float(g.sample_trilinear(jnp.asarray(pos)))
    assert got == pytest.approx(float(vals[tuple(ijk)]), rel=1e-5)


def test_procedural_volumes_shape():
    for g in (procedural.fog_sphere(n=32), procedural.cloud(n=32)):
        v = np.asarray(g.voxels)
        assert v.max() > 0 and v.min() == 0.0
        assert all(s % BRICK == 0 for s in v.shape)


def test_transforms_never_lower_to_matmul():
    """Affine transforms must compile to elementwise VPU ops, never a
    dot_general: on TPU the MXU's DEFAULT precision rounds f32 operands
    to bf16, which silently cost ~8 mantissa bits on every camera origin,
    ray direction, and world-space sample position (caught in round 2 as
    a 0.96 SSIM gap vs the oracle at 256^2 — voxel-floor flips plus
    %-level light distances)."""
    import jax

    from volumerenderer_tpu.ops import camera

    g, _ = small_grid()
    p = jnp.zeros((4, 3), jnp.float32)
    for fn in (g.world_to_index, g.index_to_world, g.world_to_index_dir):
        jaxpr = str(jax.make_jaxpr(fn)(p))
        assert "dot_general" not in jaxpr, jaxpr
    rot = jnp.eye(3, dtype=jnp.float32)
    jaxpr = str(jax.make_jaxpr(
        lambda r: camera.camera_rays(8, 8, 45.0, jnp.zeros(3), look_rotation=r)
    )(rot))
    assert "dot_general" not in jaxpr, jaxpr


def test_occ_table_lookup_matches_take():
    """The arithmetic bit-packed brick-table select (grid.dense.
    _occ_table_lookup) is bit-identical to the scattered jnp.take it
    replaces — single-word z, multi-word z (>32 z-bricks), and the
    large-table fallback all agree."""
    from volumerenderer_tpu.grid import dense as dense_mod

    rs = np.random.RandomState(7)
    for shape in [(12, 12, 12), (4, 4, 40), (3, 5, 70)]:
        table = jnp.asarray(rs.rand(*shape) < 0.4)
        X, Y, Z = shape
        relb = jnp.asarray(
            np.stack([rs.randint(0, X, 4096), rs.randint(0, Y, 4096),
                      rs.randint(0, Z, 4096)], axis=-1), jnp.int32)
        got = np.asarray(dense_mod._occ_table_lookup(table, relb))
        lin = (relb[..., 0] * Y + relb[..., 1]) * Z + relb[..., 2]
        want = np.asarray(jnp.take(table.reshape(-1), lin, mode="clip"))
        np.testing.assert_array_equal(got, want)
    # force the large-table paths (terms above the bound) and check both:
    # Z <= 128 -> z-row gather + in-register one-hot; Z > 128 -> flat take
    old = dense_mod._OCC_SELECT_MAX_TERMS
    try:
        dense_mod._OCC_SELECT_MAX_TERMS = 1
        for shape in [(6, 6, 6), (2, 3, 200)]:
            X, Y, Z = shape
            table = jnp.asarray(rs.rand(*shape) < 0.3)
            relb = jnp.asarray(
                np.stack([rs.randint(0, X, 512), rs.randint(0, Y, 512),
                          rs.randint(0, Z, 512)], axis=-1), jnp.int32)
            got = np.asarray(dense_mod._occ_table_lookup(table, relb))
            lin = (relb[..., 0] * Y + relb[..., 1]) * Z + relb[..., 2]
            want = np.asarray(jnp.take(table.reshape(-1), lin, mode="clip"))
            np.testing.assert_array_equal(got, want)
    finally:
        dense_mod._OCC_SELECT_MAX_TERMS = old


def test_brick_occupancy_lookup_formulations_agree():
    """brick_occupancy_at / _dilated_at give identical masks whether the
    packed select or the take fallback runs (same grid, random probes,
    including out-of-volume positions exercising the clamp+guard)."""
    from volumerenderer_tpu.grid import dense as dense_mod

    rs = np.random.RandomState(11)
    vol = (rs.rand(20, 24, 28) < 0.2) * rs.rand(20, 24, 28)
    g = from_dense(vol.astype(np.float32), voxel_size=1.0,
                   translation=(0.0, 0.0, 0.0))
    pos = jnp.asarray(rs.uniform(-10, 40, (8192, 3)), jnp.float32)
    occ1 = np.asarray(g.brick_occupancy_at(pos))
    dil1 = np.asarray(g.brick_occupancy_dilated_at(pos))
    old = dense_mod._OCC_SELECT_MAX_TERMS
    try:
        dense_mod._OCC_SELECT_MAX_TERMS = 0  # force jnp.take everywhere
        occ2 = np.asarray(g.brick_occupancy_at(pos))
        dil2 = np.asarray(g.brick_occupancy_dilated_at(pos))
    finally:
        dense_mod._OCC_SELECT_MAX_TERMS = old
    np.testing.assert_array_equal(occ1, occ2)
    np.testing.assert_array_equal(dil1, dil2)


def test_fetch_depth_padding():
    """Deep volumes whose brick-padded nz has no z-sub-row divisor in
    [96, 128] are zero-padded in z to the nearest cheap divisor depth
    within a 25% budget (the gather is row-issue-bound, so zero bytes
    are free — scripts/probe_fetch_roofline.py); values, bbox, and
    occupancy are unchanged (exact)."""
    from volumerenderer_tpu.grid.dense import (
        _pad_depth_for_fetch, _zrow_len, from_dense)

    assert _pad_depth_for_fetch(96) == 96  # small depths untouched
    assert _pad_depth_for_fetch(440) == 440  # already has divisor 110
    assert _pad_depth_for_fetch(264) == 288  # 96x3, +9%
    assert _zrow_len(288) == 96
    assert _pad_depth_for_fetch(136) == 136  # next good depth is +41%

    rs = np.random.RandomState(7)
    vol = (rs.rand(8, 8, 264) * (rs.rand(8, 8, 264) < 0.2)).astype(
        np.float32)
    g = from_dense(vol, bbox_min=(2, 3, 4))
    assert g.voxels.shape[2] == 288
    np.testing.assert_array_equal(np.asarray(g.bbox_max), [9, 10, 267])
    ijk = jnp.stack(jnp.meshgrid(
        jnp.arange(2, 10), jnp.arange(3, 11), jnp.arange(4, 268),
        indexing="ij"), axis=-1)
    np.testing.assert_array_equal(np.asarray(g.sample_ijk(ijk)), vol)
    # beyond the original depth: exactly zero (pad) and out-of-bbox
    probe = jnp.asarray([[2, 3, 268], [2, 3, 300]], jnp.int32)
    np.testing.assert_array_equal(np.asarray(g.sample_ijk(probe)), [0, 0])
