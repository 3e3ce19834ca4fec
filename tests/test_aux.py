"""Aux subsystems: checkpoint/resume, debug views, viewer wiring, profiling."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import jax.numpy as jnp

from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
from volumerenderer_tpu.grid import procedural
from volumerenderer_tpu.io import checkpoint
from volumerenderer_tpu.render import debug_views, photon
from volumerenderer_tpu.utils.profiling import FrameStats
from volumerenderer_tpu import viewer


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


def test_checkpoint_resume_bit_identical(tmp_path):
    r1 = small_renderer(algorithm=Algorithm.POINT)
    r1.step(3)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(r1, p)
    r1.step(2)
    want = r1.image()

    r2 = small_renderer(algorithm=Algorithm.RAY)  # different starting algo
    checkpoint.load(r2, p)
    assert int(r2.state.frame_count) == 3
    assert r2.algorithm is Algorithm.POINT
    r2.step(2)
    np.testing.assert_array_equal(r2.image(), want)


def test_checkpoint_shape_mismatch(tmp_path):
    r1 = small_renderer()
    r1.step()
    p = str(tmp_path / "c.npz")
    checkpoint.save(r1, p)
    r2 = small_renderer()
    r2.resize(8, 8)
    import pytest

    with pytest.raises(ValueError):
        checkpoint.load(r2, p)


def test_debug_views():
    r = small_renderer(algorithm=Algorithm.POINT)
    r.step()
    img_p = np.asarray(debug_views.view_point_lights(
        r.params, r.lights, r.config, radius=1.0))
    img_r = np.asarray(debug_views.view_ray_lights(
        r.params, r.lights, r.config, width=1.0))
    assert img_p.shape == (12, 16) and set(np.unique(img_p)) <= {0.0, 1.0}
    assert img_r.shape == (12, 16)
    assert img_p.sum() > 0  # lights inside the view frustum show up


def test_render_offline_and_viewer_wiring(tmp_path):
    r = small_renderer(algorithm=Algorithm.POINT)
    seen = []
    out = viewer.render_offline(
        r, 2, str(tmp_path / "o.png"), callback=lambda i, im: seen.append(i))
    assert out.shape == (12, 16, 3) and seen == [1, 2]
    v = viewer.InteractiveViewer(r)
    # The interactive window defaults to the coarse motion path (drag
    # responsiveness at settled-image brightness); the library default
    # stays exact ("off").
    assert r.config.motion_mode == "coarse"
    v.tick()  # renders one frame into the Agg canvas
    assert int(r.state.frame_count) == 3
    # Slider edit does not reset; refresh button does.
    v.sliders["absorption_coefficient"].set_val(0.3)
    assert int(r.state.frame_count) == 3
    # Every reference ImGui widget has a viewer counterpart
    # (src/main.cpp:662-692): Camera Pos + Light Source Pos SliderFloat3s
    # and the Max Lights DragInt included.
    for comp in "xyz":
        assert f"camera_pos.{comp}" in v.sliders
        assert f"light_source_world_pos.{comp}" in v.sliders
    v.sliders["camera_pos.y"].set_val(25.0)  # small_renderer cam (0,0,-15)
    np.testing.assert_allclose(
        np.asarray(r.params.camera_pos), [0.0, 25.0, -15.0])
    v.sliders["light_source_world_pos.x"].set_val(-10.0)
    assert float(np.asarray(r.params.light_source_world_pos)[0]) == -10.0
    v.sliders["max_lights"].set_val(321)
    assert int(r.params.max_lights) == 321
    assert int(r.state.frame_count) == 3  # still no auto-reset
    # Live FPS/Mrays readout (SURVEY §5.5): populated after a tick, both as
    # a figure overlay and in the window title.
    v.tick()
    assert v.stats.fps > 0
    txt = v.fps_text.get_text()
    assert "fps" in txt and "Mrays/s" in txt and "frame 4" in txt
    assert "Mrays/s" in v.fig.canvas.manager.get_window_title()
    # Algorithm radio through the real widget event layer: switching resets
    # accumulation (reference combo zeroes frameCount, src/main.cpp:651-659).
    v.radio.set_active([a.name for a in Algorithm].index("RAY"))
    assert r.algorithm is Algorithm.RAY
    assert int(r.state.frame_count) == 0
    v.tick(2)
    assert int(r.state.frame_count) == 2
    # Refresh button through the real matplotlib event pipeline (a synthetic
    # click over the button axes), not a direct renderer.refresh() call.
    from matplotlib.backend_bases import MouseEvent

    v.fig.canvas.draw()
    bb = v.btn.ax.bbox
    x, y = (bb.x0 + bb.x1) / 2, (bb.y0 + bb.y1) / 2
    for name in ("button_press_event", "button_release_event"):
        ev = MouseEvent(name, v.fig.canvas, x, y, 1)
        v.fig.canvas.callbacks.process(name, ev)
    assert int(r.state.frame_count) == 0


def test_cli_render(tmp_path):
    """`python -m volumerenderer_tpu render` end-to-end on a tiny frame."""
    from volumerenderer_tpu.__main__ import main

    out = str(tmp_path / "cli.png")
    rc = main(["render", "--size", "16", "--frames", "1",
               "--algorithm", "POINT", "--out", out])
    assert rc == 0 and (tmp_path / "cli.png").stat().st_size > 0
    # --fast tiers select the BENCHMARKS.md performance configs
    out2 = str(tmp_path / "cli_fast.png")
    rc = main(["render", "--size", "16", "--frames", "1",
               "--algorithm", "BEAM", "--fast", "decimated",
               "--out", out2])
    assert rc == 0 and (tmp_path / "cli_fast.png").stat().st_size > 0


def test_frame_stats():
    fs = FrameStats()
    fs.tick(); fs.tick(); fs.tick()
    assert fs.fps > 0
    assert fs.mrays_per_sec(100, 100) > 0


def test_native_image_writer_roundtrip(tmp_path):
    from volumerenderer_tpu.io import ppm as ppm_mod
    from volumerenderer_tpu.io.frame_writer import (
        AsyncFrameWriter, write_image_native,
    )

    rs = np.random.RandomState(30)
    img = (rs.rand(33, 47, 3) * 255).astype(np.uint8)
    # PPM: native write, python read.
    p = str(tmp_path / "n.ppm")
    write_image_native(p, img)
    np.testing.assert_array_equal(ppm_mod.read_ppm(p), img)
    # PNG: native write, PIL read.
    from PIL import Image

    p2 = str(tmp_path / "n.png")
    write_image_native(p2, img)
    np.testing.assert_array_equal(np.asarray(Image.open(p2)), img)
    # Async writer overlaps encode with the render loop.
    with AsyncFrameWriter() as fw:
        for i in range(5):
            fw.submit(str(tmp_path / f"f{i}.png"), img)
    for i in range(5):
        np.testing.assert_array_equal(
            np.asarray(Image.open(str(tmp_path / f"f{i}.png"))), img)
