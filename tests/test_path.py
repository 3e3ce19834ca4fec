"""PATH algorithm parity vs the loopy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import reference_impl as ref
from volumerenderer_tpu.engine.params import Fidelity, RenderParams, StaticConfig
from volumerenderer_tpu.grid import from_dense
from volumerenderer_tpu.render import color, path


def make_scene(fidelity=Fidelity.REFERENCE):
    rs = np.random.RandomState(14)
    vals = (rs.rand(14, 14, 14) < 0.5) * (rs.rand(14, 14, 14) * 0.9 + 0.1)
    g = from_dense(vals.astype(np.float32), voxel_size=1.2,
                   translation=(-8.0, -8.0, 5.0))
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.3, -0.2, -13.0]),
        fov=jnp.float32(48.0),
        light_source_world_pos=jnp.float32([-2.0, 1.0, 11.0]),
        scattering_probability=jnp.float32(0.25),
        absorption_coefficient=jnp.float32(0.15),
        ray_max_distance=jnp.float32(60.0),
        ray_marching_step_size=jnp.float32(0.77),
        photon_initial_intensity=jnp.float32(200.0),
    )
    config = StaticConfig(width=10, height=8, ray_tile=32,
                          max_path_segments=24, fidelity=fidelity)
    return g, params, config


@pytest.mark.slow
@pytest.mark.parametrize("frame_count", [1, 3])
def test_path_matches_oracle_reference_fidelity(frame_count):
    g, params, config = make_scene()
    steps = color.required_march_steps(g, float(params.ray_marching_step_size),
                                       config.max_march_steps)
    frame = np.asarray(path.render_frame(g, params, frame_count, config, steps))
    want = ref.render_path(g, params, frame_count, config.width, config.height,
                           max_segments=config.max_path_segments,
                           fidelity="reference")
    np.testing.assert_allclose(frame, want, rtol=5e-3, atol=5e-5)


def test_path_constant_intensity_gate():
    """path_compute_color.comp:86 — photonIntensity never attenuates in
    PATH, so intensity <= 0.01 means the reference walk never runs and the
    frame is black; just above the gate it renders normally."""
    g, params, config = make_scene()
    steps = color.required_march_steps(g, float(params.ray_marching_step_size),
                                       config.max_march_steps)
    dead = params.replace(photon_initial_intensity=jnp.float32(0.01))
    frame = np.asarray(path.render_frame(g, dead, 2, config, steps))
    assert np.all(frame == 0.0)
    want = ref.render_path(g, dead, 2, config.width, config.height,
                           max_segments=config.max_path_segments)
    assert np.all(want == 0.0)
    live = params.replace(photon_initial_intensity=jnp.float32(0.02))
    frame2 = np.asarray(path.render_frame(g, live, 2, config, steps))
    assert frame2.max() > 0.0


@pytest.mark.slow
def test_path_corrected_fidelity_runs_and_differs():
    g, params, config = make_scene(Fidelity.CORRECTED)
    steps = color.required_march_steps(g, float(params.ray_marching_step_size),
                                       config.max_march_steps)
    corrected = np.asarray(path.render_frame(g, params, 1, config, steps))
    g2, p2, c2 = make_scene(Fidelity.REFERENCE)
    reference = np.asarray(path.render_frame(g2, p2, 1, c2, steps))
    assert corrected.shape == reference.shape
    assert not np.allclose(corrected, reference)  # the bug is visible


def _bigger_scene(**cfg_kw):
    """A 32x24 scene large enough to exercise the compaction machinery
    when path_compact_min is lowered."""
    rs = np.random.RandomState(3)
    vals = (rs.rand(20, 20, 20) < 0.4) * (rs.rand(20, 20, 20) * 0.9 + 0.1)
    g = from_dense(vals.astype(np.float32), voxel_size=1.0,
                   translation=(-10.0, -10.0, 4.0))
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 0.0, -18.0]),
        light_source_world_pos=jnp.float32([-3.0, 2.0, 10.0]),
        scattering_probability=jnp.float32(0.2),
        ray_max_distance=jnp.float32(80.0),
    )
    config = StaticConfig(width=32, height=24, ray_tile=256,
                          max_path_segments=6, **cfg_kw)
    return g, params, config


def _render(g, params, config, frame_count=2, **kw):
    steps = color.required_march_steps(g, float(params.ray_marching_step_size),
                                       config.max_march_steps)
    return np.asarray(path.render_frame(g, params, frame_count, config, steps,
                                        **kw)), steps


@pytest.mark.slow
@pytest.mark.parametrize("prob", [0.2, 0.9])
def test_path_compaction_matches_full_width(prob):
    """Compacted scatter segments (path_compact_min small -> caps bind)
    reproduce the full-width walk exactly, including the overflow
    fallback (prob=0.9 keeps most rays alive past the cap schedule)."""
    g, params, config = _bigger_scene(path_compact_min=64)
    params = params.replace(scattering_probability=jnp.float32(prob))
    import dataclasses
    full_cfg = dataclasses.replace(config, path_compact_min=1 << 30)
    compact, _ = _render(g, params, config)
    full, _ = _render(g, params, full_cfg)
    np.testing.assert_array_equal(compact, full)


def test_path_frame_batched_is_exact():
    """render_frames (F frames, scatter segments batched ACROSS frames,
    engine.step.render_path_steps_cached's core) is BIT-IDENTICAL per
    frame to render_frame on the same PathView — frames are independent
    seed streams, so their scatter states concatenate."""
    g, params, config = _bigger_scene(path_compact_min=64)
    steps = color.required_march_steps(
        g, float(params.ray_marching_step_size), config.max_march_steps)
    cache = path.bake_path_view(g, params, config, steps)
    fcs = jnp.arange(1, 4, dtype=jnp.int32)
    batch = np.asarray(
        path.render_frames(g, params, fcs, config, steps, cache))
    assert batch.shape == (3, config.height, config.width)
    for i, fc in enumerate((1, 2, 3)):
        single = np.asarray(
            path.render_frame(g, params, fc, config, steps, cache=cache))
        np.testing.assert_array_equal(batch[i], single)


@pytest.mark.parametrize("cell,subblock",
                         [(2, 32), (4, 32), (4, 24)])
def test_path_occupied_cell_march_is_exact(cell, subblock):
    """Scatter segments marching only occupied coarse cells
    (march_cell > 1: dilated-brick superset, the camera march's skipping)
    are BIT-IDENTICAL to the raw walk — skipped cells have exactly-zero
    density, so they host no roll sites and consume no RNG draws.
    cell * step must stay <= one 8-voxel brick pitch (step=1 here).
    subblock=24 forces n_cells % cell-block != 0 (the padded-slice
    path)."""
    g, params, config = _bigger_scene(path_compact_min=64,
                                      path_subblock=subblock)
    raw, _ = _render(g, params, config)
    skipped, _ = _render(g, params, config, march_cell=cell)
    np.testing.assert_array_equal(raw, skipped)
    # Also through the full-width (uncompacted-rays) path.
    import dataclasses
    full_cfg = dataclasses.replace(config, path_compact_min=1 << 30)
    raw_f, _ = _render(g, params, full_cfg)
    skipped_f, _ = _render(g, params, full_cfg, march_cell=cell)
    np.testing.assert_array_equal(raw_f, skipped_f)


@pytest.mark.parametrize("cell", [1, 4])
def test_path_sorted_chunks_are_exact(cell):
    """Cost-sorted chunk compaction (path_sort_chunks) is BIT-IDENTICAL
    to image-order compaction: chunk grouping never changes per-ray walk
    arithmetic (masked rows fetch zero, draw no RNG, add nothing)."""
    import dataclasses
    g, params, config = _bigger_scene(path_compact_min=64, path_chunk=32)
    unsorted_cfg = dataclasses.replace(config, path_sort_chunks=False)
    srt, _ = _render(g, params, config, march_cell=cell)
    uns, _ = _render(g, params, unsorted_cfg, march_cell=cell)
    np.testing.assert_array_equal(srt, uns)


@pytest.mark.parametrize("with_lut", [False, True])
def test_path_fast_light_term_probe_is_close(with_lut):
    """The divide/sqrt-free light-term formulation (a PROBE for
    scripts/bench_light_eval.py — measured perf-neutral under the shadow
    LUT, so deliberately NOT a config mode) evaluates the same term to
    rounding level.  Light placed inside an occupied voxel so the LUT
    neighborhood is non-trivial."""
    g, params, _ = _bigger_scene()
    vox = np.asarray(g.voxels)
    occ = np.argwhere(vox > 0.05)
    lw = np.asarray(g.index_to_world(
        jnp.asarray(occ[len(occ) // 2][None, :], jnp.float32) + 0.5))[0]
    params = params.replace(
        light_source_world_pos=jnp.asarray(lw, jnp.float32),
        ray_marching_step_size=jnp.float32(0.77),
        absorption_coefficient=jnp.float32(0.13),
    )
    light = g.world_to_index(params.light_source_world_pos)
    lut = None
    if with_lut:
        base, vals = path._shadow_lut(g, light, 1)
        lut = (base, vals, 1)
    rs = np.random.RandomState(7)
    lo = np.asarray(g.bbox_min, np.float32)
    ext = np.asarray(g.bbox_max, np.float32) + 1.0 - lo
    pos = jnp.asarray(rs.rand(2048, 3) * ext + lo, jnp.float32)
    exact = np.asarray(path._light_term_reference(g, pos, light, params, lut))
    fast = np.asarray(
        path._light_term_reference_fast(g, pos, light, params, lut))
    np.testing.assert_allclose(fast, exact, rtol=5e-6, atol=0)


def test_path_shadow_lut_is_exact():
    """The shadow-probe LUT is bit-equal to the gathered probe (same
    floor(probe) voxel, R >= ceil(step))."""
    g, params, config = _bigger_scene(path_compact_min=64)
    with_lut, _ = _render(g, params, config, shadow_lut_radius=1)
    without, _ = _render(g, params, config, shadow_lut_radius=0)
    np.testing.assert_array_equal(with_lut, without)


@pytest.mark.slow
def test_path_cached_matches_inline():
    """render_frame(cache=bake_path_view(...)) == render_frame()."""
    g, params, config = _bigger_scene(path_compact_min=64)
    steps = color.required_march_steps(g, float(params.ray_marching_step_size),
                                       config.max_march_steps)
    cache = path.bake_path_view(g, params, config, steps,
                                shadow_lut_radius=1)
    for fc in (1, 4):
        inline = np.asarray(path.render_frame(g, params, fc, config, steps,
                                              shadow_lut_radius=1))
        cached = np.asarray(path.render_frame(g, params, fc, config, steps,
                                              shadow_lut_radius=1,
                                              cache=cache))
        np.testing.assert_array_equal(cached, inline)


def test_path_corrected_matches_oracle():
    g, params, config = make_scene(Fidelity.CORRECTED)
    steps = color.required_march_steps(g, float(params.ray_marching_step_size),
                                       config.max_march_steps)
    frame = np.asarray(path.render_frame(g, params, 1, config, steps))
    want = ref.render_path(g, params, 1, config.width, config.height,
                           max_segments=config.max_path_segments,
                           fidelity="corrected")
    np.testing.assert_allclose(frame, want, rtol=5e-3, atol=5e-5)


def test_path_stride_light_term_keeps_original_step():
    """path_stride fast tier (StaticConfig.path_stride, PARITY #23): the
    march coarsens but the single-light term derives its probe point and
    attenuation count from ``light_step`` — the ORIGINAL step — so it is
    bit-equal to the exact tier's term at the same sample positions."""
    g, params, config = _bigger_scene()
    light_local = g.world_to_index(params.light_source_world_pos)
    rs = np.random.RandomState(7)
    pos = jnp.asarray(rs.rand(64, 3) * 18.0, jnp.float32)
    want = path._light_term_reference(g, pos, light_local, params)
    scaled = params.replace(
        ray_marching_step_size=params.ray_marching_step_size * 3.0)
    got = path._light_term_reference(
        g, pos, light_local, scaled,
        light_step=params.ray_marching_step_size)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_path_stride_cached_matches_inline():
    """The stride tier's cached replay == its inline render (the
    light_step threading is consistent through bake/seg1/walk)."""
    import dataclasses

    g, params, config = _bigger_scene(path_compact_min=64)
    k = 2
    light_step = params.ray_marching_step_size
    p_eff = params.replace(
        ray_marching_step_size=light_step * float(k),
        scattering_probability=(
            1.0 - (1.0 - params.scattering_probability) ** k),
    )
    steps = color.required_march_steps(
        g, float(light_step) * k, config.max_march_steps)
    cache = path.bake_path_view(g, p_eff, config, steps,
                                shadow_lut_radius=1, light_step=light_step)
    for fc in (1, 3):
        inline = np.asarray(path.render_frame(
            g, p_eff, fc, config, steps, shadow_lut_radius=1,
            light_step=light_step))
        cached = np.asarray(path.render_frame(
            g, p_eff, fc, config, steps, shadow_lut_radius=1,
            cache=cache, light_step=light_step))
        np.testing.assert_array_equal(cached, inline)
        assert np.isfinite(inline).all()
