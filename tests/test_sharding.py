"""Multi-chip sharding on the virtual 8-device CPU mesh: sharded render ==
single-device render, for both pixel-row DP and light-axis sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volumerenderer_tpu import Algorithm, RenderParams, StaticConfig
from volumerenderer_tpu.engine.state import RenderState
from volumerenderer_tpu.engine.step import render_step
from volumerenderer_tpu.grid import procedural
from volumerenderer_tpu.parallel import sharding
from volumerenderer_tpu.render.color import required_march_steps


def scene():
    g = procedural.fog_sphere(n=24, center_world=(0.0, 0.0, 10.0),
                              world_extent=20.0)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 0.0, -15.0]),
        light_source_world_pos=jnp.float32([0.0, 0.0, 10.0]),
        scattering_probability=jnp.float32(0.4),
        ray_max_distance=jnp.float32(60.0),
        max_lights=jnp.asarray(64, jnp.int32),
    )
    config = StaticConfig(width=16, height=16, light_capacity=64,
                          max_events_per_photon=8, ray_tile=64,
                          probe_tile=64, build_tile=64,
                          max_points_per_segment=32, max_path_segments=8)
    return g, params, config


def _single_device_frames(g, params, config, algorithm, n_frames=2):
    state = RenderState.create(config.height, config.width)
    steps = required_march_steps(g, 1.0, config.max_march_steps)
    for _ in range(n_frames):
        state, _ = render_step(
            g, params, state, algorithm=algorithm, config=config,
            max_steps=steps)
    return np.asarray(state.accum), steps


@pytest.mark.parametrize(
    "algorithm",
    [Algorithm.POINT, Algorithm.SPHERE, Algorithm.RAY, Algorithm.BEAM,
     Algorithm.PATH],
)
@pytest.mark.slow
def test_row_sharded_matches_single_device(algorithm):
    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
    g, params, config = scene()
    want, steps = _single_device_frames(g, params, config, algorithm)

    mesh = sharding.make_mesh(jax.devices()[:8])
    state = RenderState.create(config.height, config.width)
    state = state.replace(accum=sharding.shard_rows(mesh, state.accum))
    for _ in range(2):
        state = sharding.sharded_render_step(
            g, params, state, algorithm=algorithm, config=config,
            max_steps=steps, mesh=mesh)
    got = np.asarray(state.accum)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize(
    "algorithm",
    [Algorithm.POINT, Algorithm.SPHERE, Algorithm.RAY, Algorithm.BEAM],
)
def test_light_sharded_matches_single_device(algorithm):
    """2-D (rows x lights) mesh: light-shard masking must compose with
    every light model — the point gather, SPHERE's closest-point epilogue
    (VERDICT r4 weak #5), AND the segment algorithms, whose per-device
    expansion/compaction packs only that device's shard."""
    g, params, config = scene()
    steps = required_march_steps(g, 1.0, config.max_march_steps)
    # Single-device frame 1.
    state = RenderState.create(config.height, config.width)
    state1, _ = render_step(
        g, params, state, algorithm=algorithm, config=config,
        max_steps=steps)
    want = np.asarray(state1.accum)

    mesh = sharding.make_mesh(jax.devices()[:8], lights_axis=4)  # 2 x 4 mesh
    state = RenderState.create(config.height, config.width)
    frame = sharding.light_sharded_radiance(
        g, params, state, algorithm=algorithm, config=config,
        max_steps=steps, mesh=mesh)
    np.testing.assert_allclose(np.asarray(frame), want, rtol=1e-4, atol=1e-6)


def test_mesh_validation():
    with pytest.raises(ValueError):
        sharding.make_mesh(jax.devices()[:6], lights_axis=4)


@pytest.mark.slow
@pytest.mark.parametrize("lights_axis", [1, 4])
def test_mesh_renderer_cached_matches_single_device(lights_axis):
    from volumerenderer_tpu.parallel.sharding import MeshRenderer

    g, params, config = scene()
    want, steps = _single_device_frames(g, params, config, Algorithm.POINT,
                                        n_frames=2)
    mesh = sharding.make_mesh(jax.devices()[:8], lights_axis=lights_axis)
    mr = MeshRenderer(g, mesh, config, params, Algorithm.POINT)
    mr.step(2)
    # The round-2 fast path is the default multi-chip steady state now:
    # per-device CompactView (dict of sharded band arrays), not the plain
    # ViewCache (VERDICT r2 #6).
    assert mr._use_compact and "b0" in mr._view and "inv_map" in mr._view
    np.testing.assert_allclose(
        np.asarray(mr.state.accum), want, rtol=1e-4, atol=1e-6)
    assert int(mr.state.frame_count) == 2


@pytest.mark.slow
def test_mesh_renderer_path_cached():
    """Multi-chip PATH renders through the sharded PathView (baked camera
    segment per device) and still equals the single-device uncached step."""
    from volumerenderer_tpu.parallel.sharding import MeshRenderer

    g, params, config = scene()
    want, steps = _single_device_frames(g, params, config, Algorithm.PATH,
                                        n_frames=2)
    mesh = sharding.make_mesh(jax.devices()[:8])
    mr = MeshRenderer(g, mesh, config, params, Algorithm.PATH)
    mr.step(2)
    assert mr._path_view is not None  # cached path actually taken
    np.testing.assert_allclose(
        np.asarray(mr.state.accum), want, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_mesh_renderer_batched_dispatch_matches_per_frame():
    """step(8) runs as ONE sharded dispatch (n_frames=8 fori_loop); results
    must equal eight separate single-frame dispatches."""
    from volumerenderer_tpu.parallel.sharding import MeshRenderer

    g, params, config = scene()
    mesh = sharding.make_mesh(jax.devices()[:8])

    per_frame = MeshRenderer(g, mesh, config, params, Algorithm.POINT)
    per_frame.frame_batch = 1
    per_frame.step(8)

    batched = MeshRenderer(g, mesh, config, params, Algorithm.POINT)
    assert batched.frame_batch == 8
    batched.step(8)

    np.testing.assert_allclose(
        np.asarray(batched.state.accum), np.asarray(per_frame.state.accum),
        rtol=1e-5, atol=1e-7)
    assert int(batched.state.frame_count) == 8


@pytest.mark.parametrize(
    "algorithm",
    [Algorithm.POINT, Algorithm.SPHERE, Algorithm.RAY, Algorithm.BEAM,
     Algorithm.PATH],
)
@pytest.mark.slow
def test_mesh_renderer_motion_coarse_matches_single_chip(algorithm):
    """Drag semantics on the mesh (VERDICT r3 #7): with
    motion_mode="coarse", a camera edit between consecutive steps renders
    the drag frame through the strided uncached sharded step, and the
    first key-stable frame settles exact — both bit-matching the
    single-chip Renderer's coarse path at every stage."""
    import dataclasses

    from volumerenderer_tpu.engine.session import Renderer
    from volumerenderer_tpu.parallel.sharding import MeshRenderer

    g, params, config = scene()
    # settle_chunks=0 pins the single-chip settle to the BLOCKING rebuild
    # this equality is defined against (MeshRenderer settles blocking; the
    # single-chip progressive overlap has its own test in test_engine).
    config = dataclasses.replace(config, motion_mode="coarse",
                                 motion_stride=4, settle_chunks=0)
    moved = params.replace(camera_pos=jnp.float32([2.0, 1.0, -16.0]))

    r = Renderer(g, config, params, algorithm=algorithm)
    mesh = sharding.make_mesh(jax.devices()[:8])
    mr = MeshRenderer(g, mesh, config, params, algorithm)

    r.step(1)
    mr.step(1)
    np.testing.assert_allclose(np.asarray(mr.state.accum),
                               np.asarray(r.state.accum),
                               rtol=1e-4, atol=1e-6)

    # Drag frame: params changed since the cached build and since the
    # previous step -> both renderers take the coarse strided path.
    r.set(camera_pos=np.asarray(moved.camera_pos))
    mr.params = moved
    r.step(1)
    mr.step(1)
    assert not r.view_exact  # single-chip coarse path actually taken
    np.testing.assert_allclose(np.asarray(mr.state.accum),
                               np.asarray(r.state.accum),
                               rtol=1e-4, atol=1e-6)

    # Key-stable frame: both settle back to the exact rebuild.
    r.step(1)
    mr.step(1)
    if algorithm is Algorithm.PATH:
        assert mr._path_view is not None
    else:
        assert r.view_exact
        assert mr._view is not None and mr._view_key is not None
    np.testing.assert_allclose(np.asarray(mr.state.accum),
                               np.asarray(r.state.accum),
                               rtol=1e-4, atol=1e-6)


def test_mesh_renderer_rejects_truncated_motion():
    from volumerenderer_tpu.parallel.sharding import MeshRenderer
    import dataclasses

    g, params, config = scene()
    config = dataclasses.replace(config, motion_mode="truncated")
    mesh = sharding.make_mesh(jax.devices()[:8])
    with pytest.raises(ValueError, match="coarse"):
        MeshRenderer(g, mesh, config, params, Algorithm.POINT)


def test_mesh_renderer_rebakes_view_on_param_edit():
    """Editing a march-relevant parameter after the first step must re-bake
    the sharded view (stale-cache bug from ADVICE r1)."""
    from volumerenderer_tpu.parallel.sharding import MeshRenderer

    g, params, config = scene()
    mesh = sharding.make_mesh(jax.devices()[:8])
    mr = MeshRenderer(g, mesh, config, params, Algorithm.POINT)
    mr.step(1)
    moved = params.replace(camera_pos=jnp.float32([4.0, 2.0, -18.0]))

    # Ground truth: fresh renderer with the new camera from frame 1.
    mr2 = MeshRenderer(g, mesh, config, moved, Algorithm.POINT)
    mr2.step(1)

    mr.params = moved
    mr.state = mr.state.refresh()  # Refresh button semantics
    mr.step(1)
    np.testing.assert_allclose(
        np.asarray(mr.state.accum), np.asarray(mr2.state.accum),
        rtol=1e-5, atol=1e-7)


def test_mesh_renderer_gather_stride_matches_single_chip():
    """gather_stride decimation (PARITY #22) is applied INSIDE
    build_compact_view_device, so the sharded per-device build inherits
    it unchanged: a decimated MeshRenderer must match a decimated
    single-chip Renderer (same centroid folds per row band)."""
    import dataclasses

    from volumerenderer_tpu.engine.session import Renderer
    from volumerenderer_tpu.parallel.sharding import MeshRenderer

    g, params, config = scene()
    config = dataclasses.replace(config, gather_stride=2,
                                 gather_eval="paired")
    r = Renderer(g, config, params, algorithm=Algorithm.POINT)
    r.step(2)
    mesh = sharding.make_mesh(jax.devices()[:8])
    mr = MeshRenderer(g, mesh, config, params, Algorithm.POINT)
    mr.step(2)
    np.testing.assert_allclose(
        np.asarray(mr.state.accum), np.asarray(r.state.accum),
        rtol=1e-4, atol=1e-6)
    assert int(mr.state.frame_count) == 2
