"""OpenVDB .vdb reader (native subset) round-trips via tests/vdb_writer.py."""

import numpy as np
import pytest

import vdb_writer
from volumerenderer_tpu.grid import from_vdb, load
from volumerenderer_tpu.grid import vdbio_native as V


def volume(seed=19, shape=(22, 13, 18)):
    rs = np.random.RandomState(seed)
    d = ((rs.rand(*shape) < 0.3) * rs.rand(*shape)).astype(np.float32)
    d[0, 0, 0] = 0.5
    d[-1, -1, -1] = 0.7  # pin the tight bbox to the array bounds
    return d


@pytest.mark.parametrize("zip_on", [False, True])
@pytest.mark.parametrize("use_mask", [False, True])
def test_roundtrip_variants(tmp_path, zip_on, use_mask):
    dense = volume()
    p = str(tmp_path / "v.vdb")
    vdb_writer.write_vdb(p, dense, bbox_min=(-6, 3, -9), voxel_size=0.8,
                         translation=(1.0, -2.0, 3.0), zip_on=zip_on,
                         use_mask_compression=use_mask, grid_name="dens")
    d2, bmin, m, v, name = V.read_vdb(p)
    np.testing.assert_array_equal(d2, dense)
    np.testing.assert_array_equal(bmin, [-6, 3, -9])
    np.testing.assert_allclose(np.diag(m), 0.8)
    np.testing.assert_allclose(v, [1.0, -2.0, 3.0])
    assert name == "dens"


def test_multiupper_spans(tmp_path):
    d = np.zeros((6, 5, 4), np.float32)
    d[0, 0, 0] = 1.5
    d[5, 4, 3] = 2.5
    p = str(tmp_path / "big.vdb")
    vdb_writer.write_vdb(p, d, bbox_min=(4090, -3, -5000))
    d2, bmin, _, _, _ = V.read_vdb(p)
    np.testing.assert_array_equal(d2, d)
    np.testing.assert_array_equal(bmin, [4090, -3, -5000])


def test_densegrid_and_load_dispatch(tmp_path):
    dense = volume(20)
    p = str(tmp_path / "g.vdb")
    vdb_writer.write_vdb(p, dense, voxel_size=0.5)
    g = from_vdb(p)
    np.testing.assert_array_equal(
        np.asarray(g.voxels)[:22, :13, :18], dense)
    g2 = load(p)
    np.testing.assert_array_equal(np.asarray(g2.voxels), np.asarray(g.voxels))


def test_grid_name_selection_and_errors(tmp_path):
    dense = volume(21)
    p = str(tmp_path / "n.vdb")
    vdb_writer.write_vdb(p, dense, grid_name="clouds")
    d2, *_rest, name = V.read_vdb(p, "clouds")
    assert name == "clouds"
    with pytest.raises(IOError):
        V.read_vdb(p, "nonexistent")
    with pytest.raises(IOError):
        V.read_vdb(str(tmp_path / "missing.vdb"))
    bad = tmp_path / "bad.vdb"
    bad.write_bytes(b"not a vdb file at all--------")
    with pytest.raises(IOError, match="magic"):
        V.read_vdb(str(bad))
