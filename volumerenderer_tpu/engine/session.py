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
from .step import (
    build_view_step,
    compact_view_step,
    probe_view_step,
    render_step,
    render_step_cached,
    render_steps_cached,
)


class Renderer:
    def __init__(
        self,
        grid: DenseGrid,
        config: StaticConfig | None = None,
        params: RenderParams | None = None,
        algorithm: Algorithm = Algorithm.RAY,  # default (src/main.cpp:119)
        gather_samples: int | None = None,
    ):
        self._grid = grid
        # Monotonic token identifying the current volume: id() of a freed
        # array can be reused by a new one (CPython allocator), which would
        # alias a replaced grid to stale cached views — so caches key on
        # this counter, bumped by every assignment to .grid.
        self._grid_token = 0
        self.config = config or StaticConfig()
        self.params = params or RenderParams.default()
        self.algorithm = algorithm
        self.gather_samples = (
            self.config.gather_samples if gather_samples is None else gather_samples
        )
        self.state = RenderState.create(self.config.height, self.config.width)
        self.lights = None
        # Baked per-view march (render.color.ViewCache): valid while the
        # fields in _view_key are unchanged.  The reference recomputes the
        # identical march every frame; we memoize it (use_view_cache=False
        # restores the recompute-every-frame behavior).
        self.use_view_cache = True
        self._view = None
        self._view_key = None

    # ---- volume ----

    @property
    def grid(self) -> DenseGrid:
        return self._grid

    @grid.setter
    def grid(self, new_grid: DenseGrid) -> None:
        self._grid = new_grid
        self._grid_token += 1

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

    def _occupied_clip(self):
        """Concrete occupied-brick bbox + step bound (host-side, cached per
        grid): marches clip to the occupied region — bit-identical results,
        fewer wasted steps on vacuum skirts (ops.march clip_box)."""
        import math

        from ..grid.dense import occupied_bbox

        if getattr(self, "_occ_cache_id", None) != self._grid_token:
            self._occ_cache = occupied_bbox(self.grid)
            self._occ_cache_id = self._grid_token
        box = self._occ_cache
        if box is None:
            return None, 1
        diag = float(np.linalg.norm(box[1] - box[0]))
        steps = int(
            math.ceil(diag / float(self.params.ray_marching_step_size))
        ) + 3
        return box, max(1, min(steps, self.config.max_march_steps))

    def _current_view(self, max_steps: int):
        """The baked march for the current camera/volume/march params,
        rebuilt when any dependency changes (camera edits invalidate; light
        edits don't — matching which UBO fields the march reads)."""
        key = (
            tuple(np.asarray(self.params.camera_pos, np.float32).tolist()),
            tuple(np.asarray(self.params.camera_rotation).reshape(-1).tolist()),
            float(self.params.fov),
            float(self.params.ray_max_distance),
            float(self.params.ray_marching_step_size),
            float(self.params.absorption_coefficient),
            self.config.width,
            self.config.height,
            max_steps,
            self.gather_samples,
            self._grid_token,
        )
        if key != self._view_key:
            clip_box, view_steps = self._occupied_clip()
            steps = min(max_steps, view_steps)
            if self.config.compact_view:
                # Probe the march once: C = max nonzero samples per ray
                # (exact top-k when it fits under the gather_samples cap),
                # row capacity = true hit-ray count (exact compaction).
                mx, _total, hits = probe_view_step(
                    self.grid, self.params, clip_box,
                    config=self.config, max_steps=steps,
                )
                mx, hits = int(mx), int(hits)
                cap = self.gather_samples if self.gather_samples else steps
                # Quantize the static sizes so small camera moves reuse
                # compiled steps instead of recompiling per rebuild.
                C = min(max(1, -(-min(mx, cap, steps) // 16) * 16), steps)
                # Exactness flag: False only when a ray has more nonzero
                # samples than the gather_samples cap allows.
                self.view_exact = mx <= C
                view = build_view_step(
                    self.grid, self.params, clip_box,
                    config=self.config, max_steps=steps,
                    gather_samples=C if C < steps else 0,
                )
                quantum = 1024
                capacity = max(quantum, -(-hits // quantum) * quantum)
                self._view = compact_view_step(view, capacity=capacity)
            else:
                self.view_exact = (
                    self.gather_samples == 0
                    or self.gather_samples >= steps
                )
                self._view = build_view_step(
                    self.grid,
                    self.params,
                    clip_box,
                    config=self.config,
                    max_steps=steps,
                    gather_samples=self.gather_samples,
                )
            self._view_key = key
        return self._view

    # Cached frames are batched into single dispatches of this size to
    # amortize launch round-trips (frames-in-flight analogue).
    frame_batch: int = 8

    def step(self, n: int = 1) -> RenderState:
        max_steps = self._max_steps
        cached = self.use_view_cache and self.algorithm is not Algorithm.PATH
        if cached:
            view = self._current_view(max_steps)
            remaining = n
            while remaining > 0:
                k = self.frame_batch if remaining >= self.frame_batch else 1
                if k == 1:
                    self.state, self.lights = render_step_cached(
                        self.grid, self.params, self.state, view,
                        algorithm=self.algorithm, config=self.config,
                        max_steps=max_steps,
                    )
                else:
                    self.state, self.lights = render_steps_cached(
                        self.grid, self.params, self.state, view,
                        algorithm=self.algorithm, config=self.config,
                        max_steps=max_steps, n_frames=k,
                    )
                remaining -= k
            return self.state
        for _ in range(n):
            self.state, self.lights = render_step(
                self.grid,
                self.params,
                self.state,
                algorithm=self.algorithm,
                config=self.config,
                max_steps=max_steps,
                gather_samples=self.gather_samples,
            )
        return self.state

    # ---- presentation ----

    def image(self) -> np.ndarray:
        return np.asarray(self.state.rgb())

    def image_u8(self) -> np.ndarray:
        return np.asarray(self.state.rgb_u8())
