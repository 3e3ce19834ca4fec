"""End-to-end frame parity for the four gather algorithms vs the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import reference_impl as ref
from volumerenderer_tpu.engine.params import Algorithm, RenderParams, StaticConfig
from volumerenderer_tpu.grid import from_dense
from volumerenderer_tpu.render import color, photon


def make_scene(w=12, h=10):
    rs = np.random.RandomState(13)
    vals = (rs.rand(14, 14, 14) < 0.55) * (rs.rand(14, 14, 14) * 0.9 + 0.1)
    g = from_dense(vals.astype(np.float32), voxel_size=1.1,
                   translation=(-8.0, -8.0, 4.0))
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 0.0, -14.0]),
        fov=jnp.float32(50.0),
        light_source_world_pos=jnp.float32([-1.0, 0.5, 10.0]),
        scattering_probability=jnp.float32(0.3),
        absorption_coefficient=jnp.float32(0.12),
        ray_max_distance=jnp.float32(70.0),
        ray_marching_step_size=jnp.float32(0.83),
        light_ray_step_size=jnp.float32(0.45),
        beam_radius=jnp.float32(0.3),
        photon_initial_intensity=jnp.float32(120.0),
        max_lights=jnp.asarray(32, jnp.int32),
    )
    config = StaticConfig(
        width=w, height=h, num_photons=16, light_capacity=32,
        max_events_per_photon=8, max_points_per_segment=64, ray_tile=64,
        probe_tile=64, build_tile=64)
    return g, params, config


NAMES = {Algorithm.POINT: "point", Algorithm.SPHERE: "sphere",
         Algorithm.RAY: "ray", Algorithm.BEAM: "beam"}


@pytest.mark.parametrize("algorithm", list(NAMES))
def test_gather_frame_matches_oracle(algorithm):
    g, params, config = make_scene()
    steps = color.required_march_steps(g, float(params.ray_marching_step_size),
                                       config.max_march_steps)
    lights = photon.generate_lights(g, params, 1, config, max_steps=steps)
    frame = np.asarray(color.render_frame(
        g, params, lights, algorithm, config, steps))

    events, count = ref.generate_lights(
        g, params, 1, num_photons=16, max_events_per_photon=8)
    assert count == int(lights.count) and count > 0
    want = ref.render_gather(g, params, events, count, NAMES[algorithm],
                             config.width, config.height)
    np.testing.assert_allclose(frame, want, rtol=5e-3, atol=2e-5)


def test_compaction_exact_when_capacity_sufficient():
    g, params, config = make_scene()
    steps = color.required_march_steps(g, float(params.ray_marching_step_size),
                                       config.max_march_steps)
    lights = photon.generate_lights(g, params, 1, config, max_steps=steps)
    full = np.asarray(color.render_frame(
        g, params, lights, Algorithm.POINT, config, steps))
    compact = np.asarray(color.render_frame(
        g, params, lights, Algorithm.POINT, config, steps,
        gather_samples=steps - 1))
    # top-k keeps all nonzero weights here (few occupied steps per ray).
    np.testing.assert_allclose(compact, full, rtol=1e-5, atol=1e-7)


def test_zero_lights_black_frame():
    g, params, config = make_scene()
    steps = 16
    lights = photon.empty_lights(config)
    frame = np.asarray(color.render_frame(
        g, params, lights, Algorithm.POINT, config, steps))
    assert frame.shape == (config.height, config.width)
    assert frame.max() == 0.0


def test_build_tile_invariance():
    """occupancy counts and view-build planes are bit-identical across
    probe_tile/build_tile choices (per-ray math with pinned rounding)."""
    import dataclasses

    g, params, config = make_scene(w=16, h=12)
    steps = color.required_march_steps(g, float(params.ray_marching_step_size),
                                       config.max_march_steps)
    o_i, d_i = color.camera_rays_index(g, params, config, 0, None)
    ref_counts = None
    ref_planes = None
    for tile in (16, 48, 192):
        cfg = dataclasses.replace(config, probe_tile=tile, build_tile=tile)
        counts = np.asarray(color.occupancy_counts_rays(
            g, params, cfg, steps, o_i, d_i, march_cell=2))
        planes = [np.asarray(p) for p in color.build_view_rays(
            g, params, cfg, steps, o_i, d_i, occupied_cap=steps,
            march_cell=2)]
        if ref_counts is None:
            ref_counts, ref_planes = counts, planes
        else:
            np.testing.assert_array_equal(counts, ref_counts)
            for a, b in zip(planes, ref_planes):
                np.testing.assert_array_equal(a, b)


def test_beam_analytic_tangent_config_plumbing():
    """segment_mode="analytic" + beam_quadrature_rule="tangent" renders a
    BEAM frame that agrees with a high-node midpoint render of the same
    integral (both approximate the h->0 limit of the discrete sum), and
    the discrete frame sits nearby — covers the StaticConfig ->
    render/color.py -> ops/gather quad_rule plumbing end-to-end."""
    g, params, config = make_scene()
    steps = color.required_march_steps(
        g, float(params.ray_marching_step_size), config.max_march_steps)
    lights = photon.generate_lights(g, params, 1, config, max_steps=steps)

    import dataclasses

    def frame(**kw):
        cfg = dataclasses.replace(config, segment_mode="analytic", **kw)
        return np.asarray(color.render_frame(
            g, params, lights, Algorithm.BEAM, cfg, steps))

    tangent8 = frame(beam_quadrature_rule="tangent", beam_quadrature_nodes=8)
    mid128 = frame(beam_quadrature_rule="midpoint", beam_quadrature_nodes=128)
    assert np.isfinite(tangent8).all() and tangent8.max() > 0
    np.testing.assert_allclose(tangent8, mid128, rtol=2e-2, atol=1e-4)
    # The tangent-8 frame must approximate the converged integral at least
    # as well as the default midpoint-16 frame does.
    mid16 = frame(beam_quadrature_rule="midpoint", beam_quadrature_nodes=16)
    err_t = np.abs(tangent8 - mid128).max()
    err_m = np.abs(mid16 - mid128).max()
    assert err_t <= err_m * 1.5 + 1e-5, (err_t, err_m)
