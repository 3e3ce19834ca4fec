"""Engine semantics: accumulation, Refresh, algorithm switch, resize
(src/main.cpp:649-698, 936-937) and the render_step frame flow."""

import numpy as np
import pytest
import jax.numpy as jnp

from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
from volumerenderer_tpu.engine.state import RenderState, accumulate
from volumerenderer_tpu.grid import procedural


def small_renderer(**kw):
    g = procedural.fog_sphere(n=24, center_world=(0.0, 0.0, 10.0),
                              world_extent=20.0)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 0.0, -15.0]),
        light_source_world_pos=jnp.float32([0.0, 0.0, 10.0]),
        scattering_probability=jnp.float32(0.4),
        ray_max_distance=jnp.float32(60.0),
        max_lights=jnp.asarray(64, jnp.int32),
    )
    config = StaticConfig(width=16, height=12, light_capacity=64,
                          max_events_per_photon=8, ray_tile=64,
                          probe_tile=64, build_tile=64,
                          max_points_per_segment=32, max_path_segments=8)
    return Renderer(g, config, params, **kw)


def test_accumulate_formula():
    acc = jnp.full((4, 4), 0.5)
    frame = jnp.full((4, 4), 1.0)
    out = accumulate(acc, frame, jnp.asarray(4))
    np.testing.assert_allclose(np.asarray(out), (0.5 * 3 + 1.0) / 4)
    # Frame 1 ignores previous contents entirely.
    out1 = accumulate(jnp.full((4, 4), 9.0) * 0, frame, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(out1), 1.0)


def test_first_frame_defines_image_and_counter():
    r = small_renderer(algorithm=Algorithm.POINT)
    r.step()
    assert int(r.state.frame_count) == 1
    first = r.image()[..., 0].copy()
    assert first.max() > 0, "fog sphere in front of camera should light up"


def test_progressive_average_converges():
    r = small_renderer(algorithm=Algorithm.POINT)
    r.step()
    f1 = r.image()[..., 0].copy()
    r.step(7)
    assert int(r.state.frame_count) == 8
    f8 = r.image()[..., 0]
    # Accumulated image is a convex combination of per-frame images; it must
    # stay within global bounds and differ from frame 1 (different photons).
    assert f8.max() <= 1.0 + 1e-6 and f8.min() >= 0.0
    assert not np.allclose(f1, f8)


def test_algorithm_switch_resets_accumulation():
    r = small_renderer(algorithm=Algorithm.POINT)
    r.step(3)
    r.set_algorithm(Algorithm.SPHERE)
    assert int(r.state.frame_count) == 0
    r.step()
    assert int(r.state.frame_count) == 1


def test_same_algorithm_switch_keeps_accumulation():
    r = small_renderer(algorithm=Algorithm.POINT)
    r.step(2)
    r.set_algorithm(Algorithm.POINT)  # no-op, as in the combo callback
    assert int(r.state.frame_count) == 2


def test_param_edit_does_not_reset_until_refresh():
    r = small_renderer(algorithm=Algorithm.POINT)
    r.step(2)
    r.set(absorption_coefficient=0.2)
    assert int(r.state.frame_count) == 2  # sliders never reset (main.cpp:662-692)
    r.refresh()
    assert int(r.state.frame_count) == 0
    r.step()
    assert int(r.state.frame_count) == 1


def test_resize_resets_and_reshapes():
    r = small_renderer(algorithm=Algorithm.POINT)
    r.step(2)
    r.resize(8, 6)
    assert r.state.accum.shape == (6, 8)
    assert int(r.state.frame_count) == 0


def test_lights_regenerated_each_frame():
    r = small_renderer(algorithm=Algorithm.POINT)
    r.step()
    c1 = int(r.lights.count)
    pos1 = np.asarray(r.lights.pos_to).copy()
    r.step()
    c2 = int(r.lights.count)
    pos2 = np.asarray(r.lights.pos_to)
    assert c1 > 0 and c2 > 0
    # Different frame -> different seeds -> different scatter positions.
    assert not np.allclose(pos1[: min(c1, c2)], pos2[: min(c1, c2)])


def test_path_runs_end_to_end():
    r = small_renderer(algorithm=Algorithm.PATH)
    r.step(2)
    img = r.image()
    assert img.shape == (12, 16, 3)
    assert int(r.lights.count) == 0  # path_light_gen is a no-op


def test_all_algorithms_produce_finite_images():
    for algo in Algorithm:
        r = small_renderer(algorithm=algo)
        r.step(2)
        img = r.image()
        assert np.isfinite(img).all(), algo
        assert img.min() >= 0.0 and img.max() <= 1.0, algo


def test_u8_presentation():
    r = small_renderer(algorithm=Algorithm.POINT)
    r.step()
    u8 = r.image_u8()
    assert u8.dtype == np.uint8 and u8.shape == (12, 16, 3)


@pytest.mark.slow
def test_view_cache_matches_uncached():
    # The ViewCache is a pure memoization: cached and uncached sessions must
    # produce identical images for the gather algorithms.
    for algo in (Algorithm.POINT, Algorithm.BEAM):
        r_cached = small_renderer(algorithm=algo)
        r_plain = small_renderer(algorithm=algo)
        r_plain.use_view_cache = False
        r_cached.step(3)
        r_plain.step(3)
        np.testing.assert_allclose(
            r_cached.image(), r_plain.image(), rtol=1e-5, atol=1e-7)


def test_view_cache_invalidation_on_camera_edit():
    r = small_renderer(algorithm=Algorithm.POINT)
    r.step(2)
    v1 = r._view
    r.set(camera_pos=[0.0, 1.0, -15.0])  # camera edit -> new view next step
    r.step()
    assert r._view is not v1
    r.set(scattering_probability=0.5)  # light param -> same view
    v2 = r._view
    r.step()
    assert r._view is v2


def test_camera_rotation_extension():
    from volumerenderer_tpu.ops.camera import look_at_rotation

    r_fwd = small_renderer(algorithm=Algorithm.POINT)
    r_fwd.step()
    base = r_fwd.image()

    # Identity rotation reproduces the reference's fixed +z look exactly.
    r_id = small_renderer(algorithm=Algorithm.POINT)
    r_id.set(camera_rotation=np.eye(3, dtype=np.float32))
    r_id.step()
    np.testing.assert_array_equal(r_id.image(), base)

    # A look-at rotation from an offset position still frames the volume.
    r_rot = small_renderer(algorithm=Algorithm.POINT)
    rot = look_at_rotation([12.0, 0.0, -10.0], [0.0, 0.0, 10.0])
    r_rot.set(camera_pos=[12.0, 0.0, -10.0], camera_rotation=rot)
    r_rot.step()
    img = r_rot.image()
    assert np.isfinite(img).all() and img.max() > 0
    assert not np.allclose(img, base)


def test_compact_view_exact_and_matches_plain_view():
    """The globally compacted view (probe -> exact top-k -> rank scatter)
    is a pure re-layout: same image as the uncompacted cache, and the
    session reports exactness (no ray exceeded the auto-sized C)."""
    import dataclasses

    from volumerenderer_tpu.render.color import CompactView

    for algo in (Algorithm.POINT, Algorithm.RAY):
        r_compact = small_renderer(algorithm=algo)
        assert r_compact.config.compact_view
        r_plain = small_renderer(algorithm=algo)
        r_plain.config = dataclasses.replace(r_plain.config, compact_view=False)
        r_compact.step(3)
        r_plain.step(3)
        assert isinstance(r_compact._view, CompactView)
        assert r_compact.view_exact
        np.testing.assert_allclose(
            r_compact.image(), r_plain.image(), rtol=1e-5, atol=1e-7)


def test_device_build_matches_host_build():
    """The zero-host-sync device build (render.color.
    build_compact_view_device: device argsort, static bands, global cap)
    renders the same images as the host-synced banded build and the plain
    ViewCache — only the cumprod association width differs (~1 ulp)."""
    import dataclasses

    from volumerenderer_tpu.render.color import CompactView

    for algo in (Algorithm.POINT, Algorithm.SPHERE):
        r_dev = small_renderer(algorithm=algo)
        r_dev.config = dataclasses.replace(
            r_dev.config, compact_build="device")
        r_host = small_renderer(algorithm=algo)
        r_host.config = dataclasses.replace(
            r_host.config, compact_build="host")
        r_plain = small_renderer(algorithm=algo)
        r_plain.config = dataclasses.replace(
            r_plain.config, compact_view=False)
        r_dev.step(3); r_host.step(3); r_plain.step(3)
        assert isinstance(r_dev._view, CompactView)
        assert r_dev.view_exact  # exact by construction (global cap)
        np.testing.assert_allclose(
            r_dev.image(), r_host.image(), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            r_dev.image(), r_plain.image(), rtol=1e-5, atol=1e-7)
    # "auto" on a small view picks the device build (no host sync).
    r_auto = small_renderer(algorithm=Algorithm.POINT)
    assert r_auto.config.compact_build == "auto"
    steps = r_auto._max_steps
    assert r_auto._device_build_ok(steps)


def test_identity_order_build_matches_occupancy_order():
    """order="identity" (the motion path's build: no occupancy pre-march,
    no lane sort) is a pure re-layout — shaded results must be IDENTICAL
    to the occupancy-sorted device build."""
    from volumerenderer_tpu.engine.step import (
        build_compact_view_device_step, render_step_cached)

    r1 = small_renderer(algorithm=Algorithm.POINT)
    r2 = small_renderer(algorithm=Algorithm.POINT)
    clip_box, steps = r1._occupied_clip()
    v_occ = build_compact_view_device_step(
        r1.grid, r1.params, clip_box, config=r1.config, steps=steps,
        march_cell=4)
    v_id = build_compact_view_device_step(
        r1.grid, r1.params, clip_box, config=r1.config, steps=steps,
        march_cell=4, order="identity")
    s1, _ = render_step_cached(r1.grid, r1.params, r1.state, v_occ,
                               algorithm=Algorithm.POINT, config=r1.config,
                               max_steps=steps)
    s2, _ = render_step_cached(r2.grid, r2.params, r2.state, v_id,
                               algorithm=Algorithm.POINT, config=r2.config,
                               max_steps=steps)
    np.testing.assert_array_equal(np.asarray(s1.accum), np.asarray(s2.accum))


def test_motion_mode_truncated_then_settles_exact():
    """motion_mode="truncated": while the camera changes between
    consecutive frames, frames render through the short-cap device build
    (approximate, fast); once the key repeats, the next step rebuilds the
    exact view and subsequent frames match a reference session exactly."""
    import dataclasses

    r = small_renderer(algorithm=Algorithm.POINT)
    r.config = dataclasses.replace(
        r.config, motion_mode="truncated", motion_cap=8)
    r.step(2)
    settled_view = r._view
    # Drag: three camera edits, one frame each -> motion path (exact view
    # object untouched, view_exact may report truncation).
    for y in (1.0, 2.0, 3.0):
        r.set(camera_pos=[0.0, y, -15.0])
        r.step(1)
        img = r.image()
        assert np.isfinite(img).all() and img.max() > 0
    assert r._view is settled_view  # no exact rebuilds mid-drag
    # Settle: key repeats -> exact rebuild; accumulation continues
    # (reference semantics: sliders never reset, src/main.cpp:662-698).
    r.step(1)
    assert r._view is not settled_view and r.view_exact
    fc = int(r.state.frame_count)
    assert fc == 6

    # Default (motion off) stays bit-exact under the same edit pattern:
    # every frame rebuilds the exact view.
    r_off = small_renderer(algorithm=Algorithm.POINT)
    r_off.step(2)
    v0 = r_off._view
    r_off.set(camera_pos=[0.0, 1.0, -15.0])
    r_off.step(1)
    assert r_off._view is not v0  # exact rebuild even mid-"drag"


def test_motion_mode_coarse_preserves_brightness_and_settles_exact():
    """motion_mode="coarse": drag frames march the full depth at a strided
    step, so their brightness approximates the settled image (the
    "truncated" prefix is several times dimmer at the reference's low
    default absorption — the bug this mode exists to fix); the first
    key-stable frame rebuilds exactly."""
    import dataclasses
    import math

    def moved(mode, **cfg):
        r = small_renderer(algorithm=Algorithm.POINT)
        # settle_chunks=0 pins the BLOCKING settle rebuild: this test is
        # the bit-parity anchor for it (the progressive overlap has its
        # own test below).
        r.config = dataclasses.replace(r.config, motion_mode=mode,
                                       settle_chunks=0, **cfg)
        r.step(1)
        settled_view = r._view
        r.set(camera_pos=[0.0, 1.0, -15.0])
        r.refresh()
        r.step(1)  # motion frame (or exact rebuild when mode="off")
        img = np.asarray(r.image())
        if mode != "off":
            assert r._view is settled_view  # no exact rebuild mid-drag
        return r, img

    r_ref, exact = moved("off")
    r_co, coarse = moved("coarse", motion_stride=4)
    _, trunc = moved("truncated", motion_cap=8)
    assert np.isfinite(coarse).all() and coarse.max() > 0
    # Brightness parity: the coarse preview lands near the exact frame;
    # the truncated prefix demonstrably does not (regression anchor).
    ratio_coarse = coarse.mean() / exact.mean()
    ratio_trunc = trunc.mean() / exact.mean()
    assert 0.6 < ratio_coarse < 1.7, ratio_coarse
    assert abs(math.log(ratio_coarse)) < abs(math.log(max(ratio_trunc,
                                                          1e-9)))
    # Settle: key repeats -> exact rebuild, matching a motion-off session
    # bit-exactly from a fresh accumulation.
    r_co.refresh()
    r_co.step(1)
    assert r_co.view_exact
    r_ref.refresh()
    r_ref.step(1)
    np.testing.assert_array_equal(np.asarray(r_co.state.accum),
                                  np.asarray(r_ref.state.accum))


def test_progressive_settle_overlap():
    """settle_chunks > 1 with motion_mode="coarse": the settle rebuild
    dispatches one row chunk per tick with coarse frames presenting in
    between (the display never starves), a re-drag mid-progress discards
    the partial chunks, and the merged view's exact shading matches a
    blocking rebuild to the documented band-cap reassociation error."""
    import dataclasses

    r = small_renderer(algorithm=Algorithm.POINT)
    r.config = dataclasses.replace(
        r.config, motion_mode="coarse", motion_stride=4, settle_chunks=4)
    r.step(1)
    r.set(camera_pos=[0.0, 1.5, -15.0])
    r.step(1)  # drag frame
    assert r._settle is None and not r.view_exact
    fc0 = int(r.state.frame_count)
    for i in range(3):  # chunks 0..2: fresh coarse frames keep flowing
        r.step(1)
        assert not r.view_exact
        assert r._settle is not None and len(r._settle["views"]) == i + 1
        assert int(r.state.frame_count) == fc0 + 1 + i
    # a re-drag mid-progress drops the partial rebuild
    r.set(camera_pos=[0.0, 2.5, -15.0])
    r.step(1)
    assert r._settle is None and not r.view_exact
    # settle again: 3 chunk ticks (coarse), then the landing tick shades
    # through the merged exact view
    for _ in range(3):
        r.step(1)
        assert not r.view_exact
    r.step(1)
    assert r.view_exact and r._settle is None
    assert len(r._view.bands) == 4  # one band per merged row chunk
    # fresh-accumulation exact frames match a blocking-rebuild session to
    # the ~1 ulp band-cap cumprod association (render.color.merge_row_views)
    r.refresh()
    r.step(1)
    rb = small_renderer(algorithm=Algorithm.POINT)
    rb.set(camera_pos=[0.0, 2.5, -15.0])
    rb.step(1)
    rb.refresh()
    rb.step(1)
    np.testing.assert_allclose(
        np.asarray(r.state.accum), np.asarray(rb.state.accum),
        rtol=2e-6, atol=1e-7)


@pytest.mark.parametrize("algo", [Algorithm.SPHERE, Algorithm.RAY,
                                  Algorithm.BEAM])
def test_motion_mode_coarse_smoke_all_gather_algorithms(algo):
    """Every gather algorithm renders sane drag frames through the coarse
    motion path (POINT and PATH have dedicated brightness tests; this
    pins the shared branch for the other three)."""
    import dataclasses

    r = small_renderer(algorithm=algo)
    r.config = dataclasses.replace(r.config, motion_mode="coarse",
                                   motion_stride=4)
    r.step(1)
    settled_view = r._view
    r.set(camera_pos=[0.0, 1.0, -15.0])
    r.refresh()
    r.step(1)
    img = np.asarray(r.image())
    assert r._view is settled_view  # no exact rebuild mid-drag
    assert np.isfinite(img).all() and img.max() > 0


def test_motion_mode_coarse_path_skips_rebake_and_settles_exact():
    """PATH honors motion_mode="coarse": camera-drag frames render through
    the uncached strided step (the baked PathView object is untouched
    mid-drag — no per-frame re-bake), keep comparable brightness, and the
    first key-stable frame re-bakes; after a refresh the settled session
    matches a motion-off session bit-exactly."""
    import dataclasses

    def moved(mode):
        r = small_renderer(algorithm=Algorithm.PATH)
        r.config = dataclasses.replace(
            r.config, motion_mode=mode, motion_stride=4)
        r.step(1)
        baked = r._path_view
        r.set(camera_pos=[0.0, 1.0, -15.0])
        r.refresh()
        r.step(1)
        if mode == "coarse":
            assert r._path_view is baked  # no re-bake mid-drag
        return r, np.asarray(r.image()), baked

    r_ref, exact, _ = moved("off")
    r_co, coarse, baked = moved("coarse")
    assert np.isfinite(coarse).all() and coarse.max() > 0
    ratio = coarse.mean() / exact.mean()
    assert 0.4 < ratio < 2.5, ratio
    # Settle: key repeats -> PathView re-baked for the new camera.
    r_co.refresh()
    r_co.step(1)
    assert r_co._path_view is not baked
    r_ref.refresh()
    r_ref.step(1)
    np.testing.assert_array_equal(np.asarray(r_co.state.accum),
                                  np.asarray(r_ref.state.accum))


def test_motion_mode_resize_and_grid_swap_are_not_drags():
    """resize() and a volume swap change the view key but are NOT camera
    drags: the next frame must be exact (a coarse frame 1 would stay
    mixed into the fresh accumulation forever).  Both sessions below
    perform the same edits; the coarse-mode one must match the motion-off
    one bit-exactly because the motion path never fires."""
    import dataclasses

    from volumerenderer_tpu.grid import procedural

    def run(mode):
        r = small_renderer(algorithm=Algorithm.POINT)
        r.config = dataclasses.replace(r.config, motion_mode=mode,
                                       motion_stride=4)
        r.step(2)
        r.resize(20, 12)
        r.step(1)  # frame 1 of the resized accumulation: must be exact
        a1 = np.asarray(r.state.accum).copy()
        r.grid = procedural.fog_sphere(n=16, center_world=(0.0, 0.0, 10.0),
                                       world_extent=20.0)
        r.refresh()
        r.step(1)  # frame 1 on the swapped volume: must be exact
        return a1, np.asarray(r.state.accum)

    a1_off, a2_off = run("off")
    a1_co, a2_co = run("coarse")
    np.testing.assert_array_equal(a1_co, a1_off)
    np.testing.assert_array_equal(a2_co, a2_off)


def test_gather_eval_paired_matches_exact_render():
    """config.gather_eval="paired" renders Point/Sphere frames equal to the
    exact evaluation up to the documented reassociation tolerance (the
    whole pipeline is otherwise identical — same lights, same view).

    gather_impl is pinned to the interpret-mode Pallas kernel: the CPU
    default ("auto" -> xla) ignores gather_eval, which would make this
    test vacuous off-TPU."""
    import dataclasses

    for algo in (Algorithm.POINT, Algorithm.SPHERE):
        r_exact = small_renderer(algorithm=algo)
        r_fast = small_renderer(algorithm=algo)
        r_exact.config = dataclasses.replace(r_exact.config,
                                             gather_impl="vpu_interpret")
        r_fast.config = dataclasses.replace(r_fast.config,
                                            gather_impl="vpu_interpret",
                                            gather_eval="paired")
        r_exact.step(3)
        r_fast.step(3)
        a = np.asarray(r_exact.image())
        b = np.asarray(r_fast.image())
        assert np.all(np.isfinite(b))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-5)


def test_gather_stride_decimation():
    """gather_stride=S (StaticConfig): S consecutive march samples fold
    into one centroid gather evaluation.  The per-ray TOTAL weight —
    brightness for a constant light field — is conserved to rounding, the
    sample planes shrink ~S x, and the shaded image stays close to exact
    on the smooth test field (documented approximate fast tier)."""
    import dataclasses

    r = small_renderer(algorithm=Algorithm.POINT)
    r.step(1)
    exact = np.asarray(r.image())
    v_ex = r._view

    r2 = small_renderer(algorithm=Algorithm.POINT)
    r2.config = dataclasses.replace(r2.config, gather_stride=2)
    r2.step(1)
    dec = np.asarray(r2.image())
    v_de = r2._view

    we = np.asarray(v_ex.bands[0].weight).sum(axis=0)
    wd = np.asarray(v_de.bands[0].weight).sum(axis=0)
    np.testing.assert_allclose(wd, we, rtol=1e-5, atol=1e-6)
    Cp_ex = v_ex.bands[0].weight.shape[0]
    Cp_de = v_de.bands[0].weight.shape[0]
    assert Cp_de <= -(-((Cp_ex + 1) // 2) // 8) * 8  # ~halved + quantum
    assert np.isfinite(dec).all() and dec.max() > 0
    # smooth-field accuracy: small relative deviation, mean preserved
    denom = max(exact.max(), 1e-6)
    assert np.abs(dec - exact).max() / denom < 0.06
    assert abs(dec.mean() / exact.mean() - 1.0) < 0.02


def test_gather_fold_gauss2():
    """gather_fold="gauss2" (StaticConfig): runs of 2*stride samples fold
    into TWO points at centroid -+ sigma with half the run weight each —
    weighted moments 0, 1, 2 of each run are preserved exactly (up to
    f32 rounding), per-frame evaluation count equals the centroid fold at
    the same stride, and the shaded image error on the smooth test field
    is no worse than the centroid fold's documented bound."""
    import dataclasses

    r = small_renderer(algorithm=Algorithm.POINT)
    r.step(1)
    exact = np.asarray(r.image())
    v_ex = r._view

    r2 = small_renderer(algorithm=Algorithm.POINT)
    r2.config = dataclasses.replace(r2.config, gather_stride=2,
                                    gather_fold="gauss2")
    r2.step(1)
    dec = np.asarray(r2.image())
    v_de = r2._view

    be, bd = v_ex.bands[0], v_de.bands[0]
    we = np.asarray(be.weight)
    wd = np.asarray(bd.weight)
    # Moment 0: total weight conserved per lane.
    np.testing.assert_allclose(wd.sum(axis=0), we.sum(axis=0),
                               rtol=1e-5, atol=1e-6)
    # Same evaluation count as centroid stride 2 (runs of 4 -> 2 points).
    Cp_ex = we.shape[0]
    assert wd.shape[0] <= -(-(2 * -(-Cp_ex // 4)) // 8) * 8
    # Moments 1 and 2 per run of 4, per axis (padding rows weight 0).
    R = 4
    pad = (-Cp_ex) % R
    for pe, pd in ((be.wx, bd.wx), (be.wy, bd.wy), (be.wz, bd.wz)):
        pe = np.pad(np.asarray(pe, np.float64), ((0, pad), (0, 0)))
        w4 = np.pad(np.asarray(we, np.float64), ((0, pad), (0, 0)))
        n_runs = pe.shape[0] // R
        pe = pe.reshape(n_runs, R, -1)
        w4 = w4.reshape(n_runs, R, -1)
        pd = np.asarray(pd, np.float64)[: 2 * n_runs].reshape(n_runs, 2, -1)
        w2 = np.asarray(wd, np.float64)[: 2 * n_runs].reshape(n_runs, 2, -1)
        for k in (1, 2):
            m_ex = (w4 * pe**k).sum(axis=1)
            m_de = (w2 * pd**k).sum(axis=1)
            sc = np.maximum(np.abs(m_ex), 1e-12)
            assert (np.abs(m_de - m_ex) / sc).max() < 5e-4, k
    denom = max(exact.max(), 1e-6)
    assert np.isfinite(dec).all() and dec.max() > 0
    assert np.abs(dec - exact).max() / denom < 0.06
    assert abs(dec.mean() / exact.mean() - 1.0) < 0.02


def test_path_stride_tier_brightness_and_plumbing():
    """StaticConfig.path_stride (PARITY #23): the PATH fast tier marches
    at stride x step with the roll probability rescaled to
    1-(1-p)^stride; the accumulated image stays finite, nonzero, and
    brightness-comparable to exact (the coarse Riemann sum of the same
    integral), and the Renderer runs the tier through BOTH the cached
    and the batched paths."""
    import dataclasses

    r = small_renderer(algorithm=Algorithm.PATH)
    r.step(6)
    exact = np.asarray(r.image())

    r2 = small_renderer(algorithm=Algorithm.PATH)
    r2.config = dataclasses.replace(r2.config, path_stride=2)
    r2.step(3)
    r2.path_frame_batch = 3  # exercise render_frames under the tier
    r2.step(3)
    fast = np.asarray(r2.image())

    assert int(r2.state.frame_count) == 6
    assert np.isfinite(fast).all() and fast.max() > 0
    # Brightness-preserving on the smooth fog sphere (same band as the
    # coarse motion tier's committed evidence).
    assert 0.6 < fast.mean() / exact.mean() < 1.7


def test_first_frame_uncached_ttff_path():
    """Renderer.first_frame_uncached (VERDICT r4 #6, opt-in; the
    interactive viewer sets it): a virgin session's frame 1 renders
    through the plain uncached step — bit-equal to use_view_cache=False
    frame 1 — without building the view; frame 2 builds it and the
    session continues cached.  One-shot: a later camera settle still
    rebuilds normally."""
    r = small_renderer(algorithm=Algorithm.POINT)
    r.first_frame_uncached = True
    r_plain = small_renderer(algorithm=Algorithm.POINT)
    r_plain.use_view_cache = False

    r.step(1)
    r_plain.step(1)
    assert r._view is None and r._view_key is None  # no build yet
    np.testing.assert_array_equal(np.asarray(r.state.accum),
                                  np.asarray(r_plain.state.accum))

    r.step(1)
    assert r._view is not None  # frame 2 built the cache
    assert int(r.state.frame_count) == 2

    # PATH branch takes the same TTFF path.
    rp = small_renderer(algorithm=Algorithm.PATH)
    rp.first_frame_uncached = True
    rp.step(1)
    assert rp._path_view is None
    rp.step(1)
    assert rp._path_view is not None
    assert np.isfinite(np.asarray(rp.state.accum)).all()
