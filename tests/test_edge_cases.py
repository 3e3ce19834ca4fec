"""Edge cases: empty volumes, camera inside the volume, missing light,
anisotropic maps, reproducibility."""

import numpy as np
import pytest
import jax.numpy as jnp

import reference_impl as ref
from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
from volumerenderer_tpu.grid import from_dense, procedural
from volumerenderer_tpu.render import color, photon


def small_config(**kw):
    base = dict(width=12, height=8, light_capacity=32,
                max_events_per_photon=8, ray_tile=32,
                probe_tile=32, build_tile=32,
                max_points_per_segment=16, max_path_segments=4)
    base.update(kw)
    return StaticConfig(**base)


@pytest.mark.slow
def test_empty_volume_black_frames():
    g = from_dense(np.zeros((16, 16, 16), np.float32),
                   translation=(-8.0, -8.0, 5.0))
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 0.0, -10.0]))
    for algo in Algorithm:
        r = Renderer(g, small_config(), params, algorithm=algo)
        r.step(2)
        img = r.image()
        assert img.max() == 0.0, algo
        assert np.isfinite(img).all(), algo


def test_camera_inside_volume():
    g = procedural.fog_sphere(n=24, center_world=(0.0, 0.0, 0.0),
                              world_extent=30.0)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 0.0, 0.0]),  # inside the fog
        light_source_world_pos=jnp.float32([0.0, 0.0, 3.0]),
        scattering_probability=jnp.float32(0.5),
    )
    r = Renderer(g, small_config(), params, algorithm=Algorithm.POINT)
    r.step(2)
    img = r.image()
    assert np.isfinite(img).all() and img.max() > 0


def test_light_source_far_outside_volume():
    g = procedural.fog_sphere(n=16, center_world=(0.0, 0.0, 10.0),
                              world_extent=10.0)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 0.0, -10.0]),
        light_source_world_pos=jnp.float32([500.0, 500.0, 500.0]),
        ray_max_distance=jnp.float32(50.0),  # photons can't even reach it
    )
    r = Renderer(g, small_config(), params, algorithm=Algorithm.POINT)
    r.step(2)
    assert int(r.lights.count) == 0
    assert r.image().max() == 0.0  # defined-black for lightCount == 0


def test_anisotropic_map_parity():
    # Non-uniform voxel size exercises world_to_index_dir normalization.
    rs = np.random.RandomState(31)
    vals = ((rs.rand(12, 12, 12) < 0.5) * rs.rand(12, 12, 12)).astype(
        np.float32)
    mat = np.diag([0.5, 1.0, 2.0]).astype(np.float32)
    g = from_dense(vals, map_mat=mat, translation=(-3.0, -6.0, 4.0))
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 0.0, -10.0]),
        fov=jnp.float32(50.0),
        light_source_world_pos=jnp.float32([0.0, 0.0, 10.0]),
        scattering_probability=jnp.float32(0.4),
        ray_max_distance=jnp.float32(60.0),
        ray_marching_step_size=jnp.float32(0.73),
        max_lights=jnp.asarray(32, jnp.int32),
    )
    config = small_config()
    steps = color.required_march_steps(g, 0.73, config.max_march_steps)
    lights = photon.generate_lights(g, params, 1, config, max_steps=steps)
    frame = np.asarray(color.render_frame(
        g, params, lights, Algorithm.POINT, config, steps))
    events, count = ref.generate_lights(
        g, params, 1, num_photons=16, max_events_per_photon=8)
    assert count == int(lights.count)
    want = ref.render_gather(g, params, events, count, "point",
                             config.width, config.height)
    np.testing.assert_allclose(frame, want, rtol=5e-3, atol=2e-5)


def test_cross_run_reproducibility():
    # Determinism replaces the reference's racy atomic append: two sessions
    # produce bit-identical images.
    def run():
        g = procedural.fog_sphere(n=16, center_world=(0.0, 0.0, 10.0),
                                  world_extent=12.0)
        params = RenderParams.default().replace(
            camera_pos=jnp.float32([0.0, 0.0, -8.0]),
            light_source_world_pos=jnp.float32([0.0, 0.0, 10.0]),
            scattering_probability=jnp.float32(0.5))
        r = Renderer(g, small_config(), params, algorithm=Algorithm.BEAM)
        r.step(3)
        return r.image()

    np.testing.assert_array_equal(run(), run())
