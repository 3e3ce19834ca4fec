"""Interactive viewer — the ImGui/presentation layer equivalent (L5:
src/main.cpp:287-336, 639-705; shaders/fullscreen.vert + sample_image.frag).

The reference presents via a Vulkan swapchain with an ImGui settings panel
(algorithm combo, 9 parameter sliders, Refresh button).  The TPU build is
headless; this module provides:

  * ``InteractiveViewer`` — matplotlib window with the same controls
    (algorithm radio, parameter sliders, Refresh), progressively refining
    while idle.  Slider edits do NOT reset accumulation; Refresh does —
    exactly the reference's semantics (src/main.cpp:662-698).
  * ``render_offline`` — headless progressive render to PNG/PPM.
"""

from __future__ import annotations

import numpy as np

from .engine.params import Algorithm
from .engine.session import Renderer
from .io import ppm
from .utils.profiling import FrameStats


def render_offline(
    renderer: Renderer,
    frames: int,
    out_path: str | None = None,
    callback=None,
) -> np.ndarray:
    """Accumulate ``frames`` frames; optionally write the result and call
    ``callback(frame_index, image)`` after each frame."""
    for i in range(frames):
        renderer.step()
        if callback is not None:
            callback(i + 1, renderer.image())
    img = renderer.image_u8()
    if out_path:
        if out_path.endswith(".ppm"):
            ppm.write_ppm(out_path, img)
        else:
            ppm.write_png(out_path, img)
    return img


class InteractiveViewer:
    """Matplotlib-based interactive session (requires a display or
    ``matplotlib.use('Agg')`` for testing the wiring)."""

    # Widgets mirror the ImGui panel one-for-one, in the reference's order
    # (src/main.cpp:662-692): SliderFloat3 -> three component sliders,
    # DragInt -> an integer-stepped slider.  Entries are
    # (field, lo, hi, kind) with kind "f" scalar float, "v3" vec3
    # component triple, "i" integer.
    SLIDERS = [
        ("camera_pos", -200.0, 200.0, "v3"),            # Camera Pos
        ("photon_initial_intensity", 0.0, 500.0, "f"),  # Photon Intensity
        ("scattering_probability", 0.0, 1.0, "f"),
        ("absorption_coefficient", 0.0, 1.0, "f"),
        ("max_lights", 0, 1_000_000, "i"),              # DragInt
        ("ray_max_distance", 0.0, 20000.0, "f"),
        ("ray_marching_step_size", 0.01, 10.0, "f"),
        ("light_source_world_pos", -100.0, 100.0, "v3"),
        ("beam_radius", 0.0, 10.0, "f"),
        ("light_ray_step_size", 0.01, 10.0, "f"),
    ]

    def __init__(self, renderer: Renderer, motion_mode: str = "coarse"):
        # The interactive window is the one place a camera DRAG exists, so
        # it defaults to the coarse motion path: while camera/march
        # parameters change between consecutive frames, each frame renders
        # through one small already-compiled program (the full depth at a
        # strided step — brightness matches the settled image) and the
        # first settled frame rebuilds exactly (StaticConfig.motion_mode
        # docs; the library Renderer default stays "off" — every frame
        # exact — for headless and parity use).  Pass motion_mode=None to
        # leave the renderer's configuration untouched.
        import dataclasses

        self.renderer = renderer
        if motion_mode is not None and (
            renderer.config.motion_mode != motion_mode
        ):
            renderer.config = dataclasses.replace(
                renderer.config, motion_mode=motion_mode
            )
        # Cold-start time-to-first-pixels (VERDICT r4 #6): the window
        # presents frame 1 through the plain uncached step — ONE compile
        # before first pixels instead of the view-build + cached-step
        # pair; the same compiled program serves every later drag frame.
        # (Renderer.first_frame_uncached docs; library default stays off.)
        renderer.first_frame_uncached = True
        # Live FPS/Mrays readout — the observability surface the reference
        # never had (SURVEY.md §5.5: its ImGui panel shows parameters only,
        # no frame counter; src/main.cpp has no timing code at all).
        self.stats = FrameStats()
        self._build_ui()

    def _build_ui(self):
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Button, RadioButtons, Slider

        self.fig = plt.figure(figsize=(10, 7))
        self.ax_img = self.fig.add_axes([0.02, 0.05, 0.62, 0.9])
        self.ax_img.axis("off")
        self.im = self.ax_img.imshow(
            self.renderer.image(), vmin=0.0, vmax=1.0
        )
        self.fps_text = self.fig.text(
            0.02, 0.965, "", family="monospace", fontsize=9
        )

        self.ax_algo = self.fig.add_axes([0.68, 0.70, 0.28, 0.25])
        self.radio = RadioButtons(
            self.ax_algo, [a.name for a in Algorithm],
            active=int(self.renderer.algorithm),
        )
        self.radio.on_clicked(self._on_algorithm)

        self.sliders = {}
        y = 0.66
        dy = 0.032
        for name, lo, hi, kind in self.SLIDERS:
            if kind == "v3":
                cur = np.asarray(getattr(self.renderer.params, name),
                                 np.float32)
                for axis, label in enumerate("xyz"):
                    ax = self.fig.add_axes([0.72, y, 0.22, 0.02])
                    s = Slider(ax, f"{name}.{label}", lo, hi,
                               valinit=float(cur[axis]))
                    s.on_changed(self._make_vec3_setter(name, axis))
                    self.sliders[f"{name}.{label}"] = s
                    y -= dy
            else:
                ax = self.fig.add_axes([0.72, y, 0.22, 0.02])
                s = Slider(ax, name, lo, hi,
                           valinit=float(getattr(self.renderer.params, name)),
                           valstep=1 if kind == "i" else None)
                s.on_changed(self._make_param_setter(name))
                self.sliders[name] = s
                y -= dy
        ax_btn = self.fig.add_axes([0.72, y - 0.02, 0.22, 0.05])
        self.btn = Button(ax_btn, "Refresh")
        self.btn.on_clicked(lambda _ev: self.renderer.refresh())

    def _on_algorithm(self, label):
        self.renderer.set_algorithm(Algorithm[label])

    def _make_param_setter(self, name):
        def setter(value):
            # Slider edits mutate params only; accumulation continues until
            # Refresh (src/main.cpp:662-698).
            self.renderer.set(**{name: value})

        return setter

    def _make_vec3_setter(self, name, axis):
        def setter(value):
            cur = np.asarray(getattr(self.renderer.params, name),
                             np.float32).copy()
            cur[axis] = value
            self.renderer.set(**{name: cur})

        return setter

    def tick(self, n: int = 1):
        """Advance n frames and update the displayed image + FPS readout."""
        self.renderer.step(n)
        # image() is a device read — it fences the async dispatch, so the
        # tick-to-tick interval FrameStats sees is real frame wall-clock.
        self.im.set_data(self.renderer.image())
        for _ in range(n):
            self.stats.tick()
        cfg = self.renderer.config
        readout = (
            f"{self.stats.fps:6.1f} fps | "
            f"{self.stats.mrays_per_sec(cfg.width, cfg.height):7.1f} Mrays/s"
            f" | frame {int(self.renderer.state.frame_count)}"
        )
        self.fps_text.set_text(readout)
        manager = getattr(self.fig.canvas, "manager", None)
        if manager is not None:
            manager.set_window_title(f"volumerenderer_tpu — {readout}")
        self.fig.canvas.draw_idle()

    def run(self, frames_per_tick: int = 1):
        """Blocking loop: render while the window is open."""
        import matplotlib.pyplot as plt

        plt.show(block=False)
        while plt.fignum_exists(self.fig.number):
            self.tick(frames_per_tick)
            plt.pause(0.001)
