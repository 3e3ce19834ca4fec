"""Native NanoVDB ingestion: blob/file round-trips and DenseGrid loading.

Note: the round-trip validates our writer against our reader; the byte
layout itself is pinned independently by the offsets in native/vdbio.cpp,
which mirror the public NanoVDB 32.x spec the reference's GLSL traverses.
"""

import numpy as np
import pytest

from volumerenderer_tpu.grid import (
    from_nanovdb_blob, from_nvdb, load, procedural, save_npz, save_nvdb,
)
from volumerenderer_tpu.grid import vdbio_native as V


def sparse_volume(shape=(30, 21, 17), seed=18, density=0.25):
    rs = np.random.RandomState(seed)
    d = (rs.rand(*shape) < density) * rs.rand(*shape)
    return d.astype(np.float32)


def test_blob_roundtrip_values_and_transform():
    dense = sparse_volume()
    mat = np.diag([0.7, 0.7, 0.7])
    blob = V.blob_from_dense(dense, bbox_min=(-4, 3, -11), mat=mat,
                             vec=(1.0, 2.0, -3.0), grid_name="rt")
    d2, bmin, m2, v2 = V.dense_from_blob(blob)
    np.testing.assert_array_equal(d2, dense)
    np.testing.assert_array_equal(bmin, [-4, 3, -11])
    np.testing.assert_allclose(m2, mat)
    np.testing.assert_allclose(v2, [1.0, 2.0, -3.0])


@pytest.mark.parametrize("codec", ["none", "zip"])
def test_file_roundtrip(tmp_path, codec):
    dense = sparse_volume()
    p = str(tmp_path / f"t_{codec}.nvdb")
    V.write_nvdb(p, dense, bbox_min=(0, 0, 0), codec=codec,
                 grid_name="mygrid")
    d2, bmin, m2, v2, name = V.read_nvdb(p)
    np.testing.assert_array_equal(d2, dense)
    assert name == "mygrid"


def test_negative_and_multiupper_coords():
    big = np.zeros((6, 5, 4), np.float32)
    big[1, 2, 3] = 7.5
    big[5, 0, 0] = 1.25
    for origin in [(-5000, -1, -4097), (4095, 0, 8191)]:
        blob = V.blob_from_dense(big, bbox_min=origin)
        d2, bmin, _, _ = V.dense_from_blob(blob)
        np.testing.assert_array_equal(d2, big)
        np.testing.assert_array_equal(bmin, origin)


def test_densegrid_from_nvdb(tmp_path):
    g = procedural.fog_sphere(n=24)
    p = str(tmp_path / "sphere.nvdb")
    save_nvdb(g, p)
    g2 = from_nvdb(p)
    # Voxels equal over the original bbox (padding may differ).
    np.testing.assert_allclose(
        np.asarray(g2.voxels)[:24, :24, :24],
        np.asarray(g.voxels)[:24, :24, :24],
    )
    np.testing.assert_allclose(
        np.asarray(g2.map_mat), np.asarray(g.map_mat), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g2.map_vec), np.asarray(g.map_vec), rtol=1e-6
    )


def test_load_dispatch_and_npz(tmp_path):
    g = procedural.fog_sphere(n=16)
    pz = str(tmp_path / "g.npz")
    save_npz(g, pz)
    g2 = load(pz)
    np.testing.assert_array_equal(np.asarray(g2.voxels), np.asarray(g.voxels))
    with pytest.raises(ValueError):
        load("/tmp/nope.xyz")


def test_blob_parses_as_reference_ssbo_payload():
    # The blob is exactly what the reference uploads (src/main.cpp:1197);
    # from_nanovdb_blob ingests it directly.
    dense = sparse_volume((12, 12, 12))
    blob = V.blob_from_dense(dense, bbox_min=(2, 2, 2))
    g = from_nanovdb_blob(blob)
    np.testing.assert_array_equal(
        np.asarray(g.voxels)[:12, :12, :12], dense
    )
