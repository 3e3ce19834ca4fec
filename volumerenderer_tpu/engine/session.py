"""Interactive renderer session — the host-application layer (VolumeApp,
src/main.cpp:101-245) minus the window system.

Owns the grid, params, algorithm, and accumulation state, and reproduces the
UI semantics exactly (src/main.cpp:649-698):

  * ``set_algorithm``      — combo box: switches algorithm AND resets
                             accumulation (src/main.cpp:654-658).
  * ``set(**fields)``      — sliders: edit params; accumulation does NOT
                             auto-reset (the user presses Refresh).
  * ``refresh``            — Refresh button: frameCount = 0 (src/main.cpp:695).
  * ``step``               — one drawFrame.
  * ``image / image_u8``   — the presented accumulation buffer (replacing the
                             fullscreen blit, shaders/fullscreen.vert +
                             sample_image.frag).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..grid.dense import DenseGrid
from ..render.color import required_march_steps
from .params import Algorithm, RenderParams, StaticConfig
from .state import RenderState
from .step import render_step


class Renderer:
    def __init__(
        self,
        grid: DenseGrid,
        config: StaticConfig | None = None,
        params: RenderParams | None = None,
        algorithm: Algorithm = Algorithm.RAY,  # default (src/main.cpp:119)
        gather_samples: int | None = None,
    ):
        self.grid = grid
        self.config = config or StaticConfig()
        self.params = params or RenderParams.default()
        self.algorithm = algorithm
        self.gather_samples = (
            self.config.gather_samples if gather_samples is None else gather_samples
        )
        self.state = RenderState.create(self.config.height, self.config.width)
        self.lights = None

    # ---- UI semantics ----

    def set_algorithm(self, algorithm: Algorithm) -> None:
        if algorithm != self.algorithm:
            self.algorithm = algorithm
            self.state = self.state.refresh()

    def set(self, **fields) -> None:
        """Edit RenderParams fields (slider semantics: no accumulation reset)."""
        self.params = self.params.replace(
            **{k: jax.numpy.asarray(v, getattr(self.params, k).dtype) for k, v in fields.items()}
        )

    def refresh(self) -> None:
        self.state = self.state.refresh()

    def resize(self, width: int, height: int) -> None:
        """Swapchain recreation: new buffers, frameCount = 0
        (src/main.cpp:936-956)."""
        self.config = dataclasses.replace(self.config, width=width, height=height)
        self.state = RenderState.create(height, width)

    # ---- frame loop ----

    @property
    def _max_steps(self) -> int:
        return required_march_steps(
            self.grid,
            float(self.params.ray_marching_step_size),
            self.config.max_march_steps,
        )

    def step(self, n: int = 1) -> RenderState:
        for _ in range(n):
            self.state, self.lights = render_step(
                self.grid,
                self.params,
                self.state,
                algorithm=self.algorithm,
                config=self.config,
                max_steps=self._max_steps,
                gather_samples=self.gather_samples,
            )
        return self.state

    # ---- presentation ----

    def image(self) -> np.ndarray:
        return np.asarray(self.state.rgb())

    def image_u8(self) -> np.ndarray:
        return np.asarray(self.state.rgb_u8())
