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

    # Slider ranges mirror the ImGui widgets (src/main.cpp:662-692).
    SLIDERS = [
        ("photon_initial_intensity", 0.0, 500.0),
        ("scattering_probability", 0.0, 1.0),
        ("absorption_coefficient", 0.0, 1.0),
        ("ray_max_distance", 0.0, 20000.0),
        ("ray_marching_step_size", 0.01, 10.0),
        ("beam_radius", 0.0, 10.0),
        ("light_ray_step_size", 0.01, 10.0),
    ]

    def __init__(self, renderer: Renderer):
        self.renderer = renderer
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

        self.ax_algo = self.fig.add_axes([0.68, 0.70, 0.28, 0.25])
        self.radio = RadioButtons(
            self.ax_algo, [a.name for a in Algorithm],
            active=int(self.renderer.algorithm),
        )
        self.radio.on_clicked(self._on_algorithm)

        self.sliders = {}
        y = 0.62
        for name, lo, hi in self.SLIDERS:
            ax = self.fig.add_axes([0.72, y, 0.22, 0.03])
            s = Slider(ax, name, lo, hi,
                       valinit=float(getattr(self.renderer.params, name)))
            s.on_changed(self._make_param_setter(name))
            self.sliders[name] = s
            y -= 0.06
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

    def tick(self, n: int = 1):
        """Advance n frames and update the displayed image."""
        self.renderer.step(n)
        self.im.set_data(self.renderer.image())
        self.fig.canvas.draw_idle()

    def run(self, frames_per_tick: int = 1):
        """Blocking loop: render while the window is open."""
        import matplotlib.pyplot as plt

        plt.show(block=False)
        while plt.fignum_exists(self.fig.number):
            self.tick(frames_per_tick)
            plt.pause(0.001)
