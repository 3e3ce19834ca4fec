"""CPU_test-equivalent density renderer vs the loopy oracle + golden stats."""

import numpy as np
import jax.numpy as jnp

import reference_impl as ref
from volumerenderer_tpu.grid import from_dense, procedural
from volumerenderer_tpu.io import ppm
from volumerenderer_tpu.render import density
from volumerenderer_tpu.utils.ssim import ssim


def test_density_matches_oracle():
    rs = np.random.RandomState(15)
    vals = rs.rand(10, 10, 10).astype(np.float32)
    # Place the volume straight ahead of the test camera at z ~ 25.
    g = from_dense(vals, bbox_min=(-5, -3, 20))
    W = H = 12
    got = np.asarray(density.render_density(
        g, width=W, height=H, camera_pos=(0.0, 0.0, -10.0), fov=45.0,
        t_max=50.0, dt=0.9))
    want = ref.render_density(g, W=W, H=H, cam_pos=(0.0, 0.0, -10.0),
                              fov=45.0, t_max=50.0, dt=0.9)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_density_grayscale_mapping():
    d = jnp.asarray([[10.0, 60.0], [0.0, 100.0]])
    u8 = np.asarray(density.to_grayscale_u8(d))
    np.testing.assert_array_equal(u8, [[50, 255], [0, 255]])


def test_density_golden_self_consistency(tmp_path):
    # Deterministic render -> PPM roundtrip -> SSIM == 1 with itself.
    g = procedural.fog_sphere(n=32, center_world=(0.0, 0.0, 30.0),
                              world_extent=30.0)
    img = np.asarray(density.render_density(
        g, width=64, height=64, camera_pos=(0.0, 0.0, -20.0),
        t_max=80.0, dt=1.0, apply_transform=True))
    u8 = np.asarray(density.to_grayscale_u8(img))
    p = tmp_path / "out.ppm"
    ppm.write_ppm(str(p), u8)
    back = ppm.read_ppm(str(p))
    np.testing.assert_array_equal(back[..., 0], u8)
    assert ssim(u8 / 255.0, u8 / 255.0) == 1.0
    assert img.max() > 0
