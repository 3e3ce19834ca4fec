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
import warnings

import jax
import numpy as np

from ..grid.dense import DenseGrid
from ..render.color import required_march_steps
from .params import Algorithm, RenderParams, StaticConfig
from .state import RenderState
from .step import (
    band_from_planes_step,
    bake_path_view_step,
    build_compact_view_device_step,
    build_view_rays_step,
    build_view_step,
    camera_rays_index_step,
    occupancy_counts_rays_step,
    render_path_step_cached,
    render_path_steps_cached,
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
        # In-flight progressive settle rebuild (see _settle_step).
        self._settle = None
        # Time-to-first-frame (VERDICT r4 #6): when True, a VIRGIN
        # renderer presents frame 1 through the plain uncached step — one
        # compiled program (march + gather fused) instead of the
        # view-build + cached-step pair, so cold-start pixels appear
        # after ~one XLA compile; the view builds before frame 2 as
        # usual.  OFF by default: frame 1 then differs from the cached
        # path by reduction order (up to ~1e-2 absolute at golden scenes
        # — different kernels sum lights in different orders), and a drag
        # before frame 2 takes the blocking build (no view key yet).  The
        # interactive viewer opts in — the one surface where cold
        # time-to-first-pixels is user-visible; the first compiled
        # program is then reused by every coarse drag frame (params are
        # traced).
        self.first_frame_uncached = False
        self._ttff_done = False  # one-shot: only the very first frame
        # Event-budget truncation check (PARITY #1): pending until the
        # first frame of each accumulation (_maybe_warn_light_truncation).
        self._budget_checked = False
        # PATH's baked camera segment (render.path.PathView) — keyed like
        # the ViewCache plus the light fields its prefix bakes in.
        self._path_view = None
        self._path_view_key = None

    # ---- volume ----

    @property
    def grid(self) -> DenseGrid:
        return self._grid

    @grid.setter
    def grid(self, new_grid: DenseGrid) -> None:
        self._grid = new_grid
        self._grid_token += 1
        # A volume swap changes the view key but is not a camera drag:
        # the next frame must be exact, not a coarse motion preview.
        self._suppress_motion_once = True
        self._settle = None

    # ---- UI semantics ----

    def set_algorithm(self, algorithm: Algorithm) -> None:
        if algorithm != self.algorithm:
            self.algorithm = algorithm
            self.state = self.state.refresh()
            self._budget_checked = False

    def set(self, **fields) -> None:
        """Edit RenderParams fields (slider semantics: no accumulation reset)."""
        self.params = self.params.replace(
            **{k: jax.numpy.asarray(v, getattr(self.params, k).dtype) for k, v in fields.items()}
        )

    def refresh(self) -> None:
        self.state = self.state.refresh()
        self._budget_checked = False

    def _maybe_warn_light_truncation(self) -> None:
        """One-time runtime check per accumulation (PARITY #1 scale
        caveat, VERDICT r4 weak #3): if some photon scattered with no
        free event slot this frame — i.e. ``max_events_per_photon``
        TRUNCATED the light population below what the reference's
        unbounded walk would emit (light_gen.comp:51-87) — warn instead
        of rendering quietly dimmer/noisier.  Costs one scalar readback
        on the first frame after construction/refresh/algorithm switch;
        steady-state frames never sync."""
        if self._budget_checked:
            return
        self._budget_checked = True
        if bool(self.lights.truncated):
            warnings.warn(
                "photon event budget saturated: some photon scattered "
                f"with all {self.config.max_events_per_photon} of its "
                "event slots full, so this frame's light population is "
                "truncated below the reference's unbounded walk (PARITY "
                "#1 scale caveat). Raise "
                "StaticConfig.max_events_per_photon (and light_capacity "
                "for headroom past params.max_lights) for "
                "reference-scale light populations.",
                RuntimeWarning,
                stacklevel=3,
            )

    def resize(self, width: int, height: int) -> None:
        """Swapchain recreation: new buffers, frameCount = 0
        (src/main.cpp:936-956)."""
        self.config = dataclasses.replace(self.config, width=width, height=height)
        self.state = RenderState.create(height, width)
        # A resize changes the view key but is not a camera drag: frame 1
        # of the fresh accumulation must be exact, not a coarse motion
        # preview (which would stay mixed into the average forever).
        self._suppress_motion_once = True
        self._settle = None

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

    def _make_view_key(self, max_steps: int):
        return (
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

    def _current_view(self, max_steps: int):
        """The baked march for the current camera/volume/march params,
        rebuilt when any dependency changes (camera edits invalidate; light
        edits don't — matching which UBO fields the march reads)."""
        key = self._make_view_key(max_steps)
        if key != self._view_key or self._view is None:
            # Release the stale view FIRST: at bunny_cloud scale it holds
            # multiple GB of HBM and coexisting with the rebuild would OOM.
            # (_view can be None at a matching key if a progressive settle
            # rebuild was abandoned by a drag back to this exact camera.)
            self._view = None
            self._view_key = None
            clip_box, view_steps = self._occupied_clip()
            steps = min(max_steps, view_steps)
            if self.config.compact_view and self._device_build_ok(steps):
                self._view = self._build_compact_view_device(clip_box, steps)
            elif self.config.compact_view:
                self._view = self._build_compact_view(clip_box, steps)
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

    def _shadow_lut_radius(self) -> int:
        """ceil(step) when the PATH shadow-probe LUT applies (REFERENCE
        fidelity, radius within config.shadow_lut_max_radius), else 0."""
        import math

        from .params import Fidelity

        if self.config.fidelity is not Fidelity.REFERENCE:
            return 0
        r = math.ceil(float(self.params.ray_marching_step_size))
        return r if 0 < r <= self.config.shadow_lut_max_radius else 0

    def _path_effective(self, max_steps: int):
        """The path_stride fast tier's effective (params, light_step,
        max_steps): the march step scales by the stride, the roll
        probability becomes 1 - (1-p)^stride (expected scatter events per
        unit length are preserved — the reference rolls independently per
        step, light_gen-style, path_compute_color.comp:96), and the light
        term keeps the ORIGINAL step via ``light_step`` (so the shadow
        LUT and the attenuation count stay exact at any stride).
        stride 1 returns the params untouched (bit-parity default)."""
        k = self.config.path_stride
        if k <= 1:
            return self.params, None, max_steps
        step0 = self.params.ray_marching_step_size
        p0 = self.params.scattering_probability
        params = self.params.replace(
            ray_marching_step_size=step0 * float(k),
            scattering_probability=1.0 - (1.0 - p0) ** k,
        )
        steps = required_march_steps(
            self.grid,
            float(self.params.ray_marching_step_size) * k,
            self.config.max_march_steps,
        )
        return params, step0, min(steps, max_steps)

    def _make_path_view_key(self, max_steps: int, lut_radius: int,
                            params: RenderParams | None = None):
        p = self.params if params is None else params
        return (
            tuple(np.asarray(p.camera_pos, np.float32).tolist()),
            tuple(np.asarray(p.camera_rotation).reshape(-1).tolist()),
            float(p.fov),
            float(p.ray_max_distance),
            float(p.ray_marching_step_size),
            float(p.absorption_coefficient),
            tuple(np.asarray(p.light_source_world_pos,
                             np.float32).tolist()),
            float(p.photon_initial_intensity),
            self.config.width,
            self.config.height,
            max_steps,
            lut_radius,
            self.config.fidelity,
            self._grid_token,
        )

    def _current_path_view(self, max_steps: int, lut_radius: int,
                           params: RenderParams | None = None,
                           light_step=None):
        """The baked PATH camera segment for the current scene — the
        ViewCache dependency key plus every field the contribution prefix
        bakes in (light position/intensity; scattering probability and
        frame counter stay per-frame).  ``params``: the path_stride-scaled
        effective params (None = self.params)."""
        p = self.params if params is None else params
        key = self._make_path_view_key(max_steps, lut_radius, params=p)
        if key != self._path_view_key:
            self._path_view = None
            self._path_view_key = None
            self._path_view = bake_path_view_step(
                self.grid, p, config=self.config,
                max_steps=max_steps, shadow_lut_radius=lut_radius,
                light_step=light_step,
            )
            self._path_view_key = key
        return self._path_view

    # Cached frames are batched into single dispatches of this size to
    # amortize launch round-trips (frames-in-flight analogue).
    frame_batch: int = 8

    # HBM budget for one band's baked planes during the compact-view
    # build (the transpose to lane layout transiently doubles it); views
    # exceeding it are built band-by-band — bunny_cloud-scale marches
    # would otherwise materialize ~8 GB of planes at once.
    view_build_budget_bytes: int = 3 << 29

    # Budget for the DEVICE build's resident planes (all rays x global
    # cap x 16 B).  Within it, compact_build="auto" picks the zero-host-
    # sync static-shape build; beyond it (bunny-scale marches) the
    # host-synced banded build bounds memory with count-aware caps.
    device_view_budget_bytes: int = 6 << 30

    def _device_build_ok(self, steps: int) -> bool:
        from ..ops.pallas.gather_lanes import TILE_L

        mode = self.config.compact_build
        if mode == "host" or self.gather_samples:
            return False
        n_rays = self.config.height * self.config.width
        lanes_n = -(-n_rays // TILE_L) * TILE_L
        cell = max(
            1, int(8.0 // max(float(self.params.ray_marching_step_size),
                              1e-6))
        )
        s_eff = -(-steps // cell) * cell if cell > 1 else steps
        fits = lanes_n * s_eff * 16 <= self.device_view_budget_bytes
        if mode == "device":
            return True
        return fits

    def _build_compact_view_device(self, clip_box, steps: int):
        """Zero-host-sync compact build (render.color.
        build_compact_view_device, one jit dispatch): device argsort lane
        order, fixed band shapes, global cap == steps — EXACT by
        construction (cap >= any per-ray occupied count), so no probe
        readback is needed; camera edits re-run the same compiled program
        (no recompile churn while orbiting)."""
        cell = max(
            1, int(8.0 // max(float(self.params.ray_marching_step_size),
                              1e-6))
        )
        self.view_exact = True
        return build_compact_view_device_step(
            self.grid, self.params, clip_box,
            config=self.config, steps=steps, march_cell=cell,
        )

    def _build_compact_view(self, clip_box, steps: int):
        """Build the lane-per-ray compact view (render.color.CompactView)
        directly from the occupancy counts — no full-image planes, no
        device-side compaction pass, and miss rays are never marched:

        1. Occupancy pre-pass: per-ray occupied fine-sample bounds from the
           1-brick-dilated table at coarse cells (no volume fetches, 1/cell
           the sample rate).  counts[r]==0 proves ray r black.
        2. Host sort: hit rays ordered by descending bound -> compact lane
           order (tight per-block sample bounds in the shade kernels) and
           the inv_map/src index vectors.
        3. March per BAND of sorted lanes with the band's own cap K_b —
           plane width hugs each band's need, bounding peak HBM to
           ``view_build_budget_bytes`` without giant-scene OOM.
        """
        import jax.numpy as jnp
        import numpy as np

        from ..ops.pallas.gather_lanes import TILE_L
        from ..render.color import CompactView

        cfg = self.config
        H, W = cfg.height, cfg.width
        n_rays = H * W
        step_f = float(self.params.ray_marching_step_size)
        cell = max(1, int(8.0 // max(step_f, 1e-6)))
        use_occ = cfg.interpolation == "nearest" and cell > 1
        # Compute the camera rays ONCE and feed the same arrays to probe
        # and band builds: separately-compiled camera/transform math can
        # differ by ulps between programs, which would shift every sample
        # position and void the probe's superset guarantee.
        o_i, d_i = camera_rays_index_step(self.grid, self.params, config=cfg)
        if use_occ:
            counts = np.asarray(occupancy_counts_rays_step(
                self.grid, self.params, clip_box, o_i, d_i,
                config=cfg, max_steps=steps, march_cell=cell,
            ))[:n_rays]
        else:
            # No occupancy structure (e.g. trilinear): every ray is a
            # candidate at the full step budget.
            counts = np.full((n_rays,), steps, np.int32)
        order = np.argsort(-counts, kind="stable").astype(np.int32)
        hit_n = max(1, int((counts > 0).sum()))
        lanes_n = -(-hit_n // TILE_L) * TILE_L
        order_l = order[:min(lanes_n, n_rays)]
        if len(order_l) < lanes_n:  # tiny views: pad with repeated ray 0
            order_l = np.concatenate(
                [order_l, np.zeros(lanes_n - len(order_l), np.int32)]
            )
        counts_l = np.where(
            np.arange(lanes_n) < hit_n, counts[order_l], 0
        ).astype(np.int32)

        gs = self.gather_samples
        mx = int(counts_l[0])
        self.view_exact = (not gs) or gs >= mx

        order_dev = jnp.asarray(order_l)

        bands = []
        startl = 0
        while startl < lanes_n:
            kb_fine = max(int(counts_l[startl]), 1)
            # Quantized band cap: whole cells, 16-step granularity for
            # compile-cache stability across small camera moves.
            Kb = min(max(-(-kb_fine // 16) * 16, cell), steps)
            plane_c = min(gs, Kb) if gs else Kb
            per_lane = max(plane_c, 1) * 16
            max_lanes = max(
                TILE_L,
                (self.view_build_budget_bytes // per_lane) // TILE_L * TILE_L,
            )
            size = min(lanes_n - startl, max_lanes)
            idx = jax.lax.dynamic_slice_in_dim(order_dev, startl, size)
            o_b = jnp.take(o_i, idx, axis=0)
            d_b = jnp.take(d_i, idx, axis=0)
            wx, wy, wz, w = build_view_rays_step(
                self.grid, self.params, clip_box, o_b, d_b,
                config=cfg, max_steps=steps,
                gather_samples=gs if gs and gs < Kb else 0,
                occupied_cap=Kb, march_cell=cell,
            )
            bands.append(band_from_planes_step(wx, wy, wz, w))
            startl += size

        inv = np.full((n_rays,), lanes_n, np.int32)
        inv[order_l[:hit_n]] = np.arange(hit_n, dtype=np.int32)
        view = CompactView(
            bands=tuple(bands),
            inv_map=jnp.asarray(inv),
            src=order_dev,
            n_rays=n_rays,
            rows=H,
        )
        if self.config.gather_stride > 1:
            # The device build decimates inside its own dispatch; the
            # host-banded build decimates here (same fold, per band).
            from ..render import color as color_mod

            view = color_mod.decimate_view(
                view, int(self.config.gather_stride),
                fold=self.config.gather_fold)
        return view
    def _motion_steps(self, n: int, max_steps: int) -> RenderState:
        """Camera-in-motion frames (config.motion_mode != "off"): render
        through a cheap degraded path — the SAME static-shape device build
        at reduced work, so every drag frame re-runs one already-compiled
        program (no probe readback, no host sort, no recompiles).  The
        settled camera takes the exact rebuild on its next (key-stable)
        frame; the reference re-marches fully every frame but on
        texture-unit hardware (src/main.cpp:620-934).

        "coarse" (preferred): march the full depth at motion_stride x the
        configured step size through the PLAIN UNCACHED step — no view
        build, no transposes (VERDICT r2 #3(a)).  Every march term is
        step-weighted, so the coarser Riemann sum approximates the same
        integral — drag frames keep the settled image's brightness.
        Measured @1080p/96^3 (scripts/probe_motion_paths.py): uncached
        stride 12 = 162 ms (12.8 Mrays/s, image mean within 7% of
        exact) vs 234 ms for the same stride through the device build
        (fixed build/transpose cost) and 194 ms-but-5.5x-dim for the
        truncated prefix.  "truncated": first motion_cap occupied
        samples only via the short-cap device build (dim at low
        absorption; see StaticConfig docs)."""
        if self.config.motion_mode == "coarse":
            import math

            from .params import Fidelity

            stride = max(1, int(self.config.motion_stride))
            base = float(self.params.ray_marching_step_size)
            coarse = base * stride
            params = self.params.replace(
                ray_marching_step_size=np.float32(coarse))
            max_steps = required_march_steps(
                self.grid, coarse, self.config.max_march_steps)
            self.view_exact = stride == 1
            kw = {}
            if self.algorithm is Algorithm.PATH:
                # PATH's per-step knobs re-derived for the coarse step:
                # the shadow-probe LUT radius (usually 0 — a stride-12
                # radius exceeds shadow_lut_max_radius, which just turns
                # the LUT off) and the scatter-segment march cell.
                r = math.ceil(coarse)
                kw["shadow_lut_radius"] = (
                    r if self.config.fidelity is Fidelity.REFERENCE
                    and 0 < r <= self.config.shadow_lut_max_radius else 0)
                kw["march_cell"] = max(1, int(8.0 // max(coarse, 1e-6)))
            for _ in range(n):
                self.state, self.lights = render_step(
                    self.grid, params, self.state,
                    algorithm=self.algorithm, config=self.config,
                    max_steps=max_steps,
                    gather_samples=self.gather_samples, **kw,
                )
            return self.state
        clip_box, view_steps = self._occupied_clip()
        steps = min(self.config.motion_cap, view_steps, max_steps)
        cell = max(
            1, int(8.0 // max(float(self.params.ray_marching_step_size),
                              1e-6))
        )
        self.view_exact = steps >= min(view_steps, max_steps)
        mv = build_compact_view_device_step(
            self.grid, self.params, clip_box,
            config=self.config, steps=steps, march_cell=cell,
            order="identity",
        )
        for _ in range(n):
            self.state, self.lights = render_step_cached(
                self.grid, self.params, self.state, mv,
                algorithm=self.algorithm, config=self.config,
                max_steps=max_steps,
            )
        return self.state

    def _settle_step(self, key, max_steps: int, n: int) -> bool:
        """Advance the progressive settle rebuild (StaticConfig.
        settle_chunks): dispatch ONE row-chunk compact build for the
        settled camera, then render this tick's frames through the coarse
        motion path so the display never freezes — the chunk and the
        coarse frame share the device queue, so the inter-frame gap is
        ~rebuild/settle_chunks + one coarse frame instead of one
        rebuild-sized stall.  When the last chunk lands, the chunks merge
        into the full exact view (render.color.merge_row_views) and the
        caller proceeds to exact shading.

        Returns True when an exact view for ``key`` is installed — or the
        progressive path is not applicable (settle_chunks <= 1, height
        not divisible, non-coarse motion, host/banded builds) and the
        caller should rebuild blocking.  Measured @1080p/96^3
        (scripts/probe_settle_overlap.py): see BENCHMARKS.md."""
        K = int(getattr(self.config, "settle_chunks", 0))
        H = self.config.height
        if (
            K <= 1
            or H % K
            or self.config.motion_mode != "coarse"
            or not self.config.compact_view
        ):
            self._settle = None
            return True
        st = self._settle
        if st is not None and st.get("K") != K:
            st = None  # settle_chunks changed mid-progress: restart
        if st is None or st["key"] != key:
            clip_box, view_steps = self._occupied_clip()
            steps = min(max_steps, view_steps)
            if not self._device_build_ok(steps):
                self._settle = None
                return True
            # Drop the stale full view NOW: the chunk list grows toward
            # full-view size, and coexisting with the old view would
            # double the peak HBM of exactly the configuration the device
            # budget was sized for.  The stale KEY stays — it is the
            # "camera is away from the settled view" signal the moving
            # classifier needs during a re-drag (_current_view rebuilds
            # on a None view regardless).
            self._view = None
            st = self._settle = {
                "key": key, "clip": clip_box, "steps": steps, "views": [],
                "K": K,
            }
        cell = max(
            1, int(8.0 // max(float(self.params.ray_marching_step_size),
                              1e-6))
        )
        i = len(st["views"])
        from ..ops.pallas.gather_lanes import TILE_L

        # Proportionally smaller bands INSIDE each chunk: a row chunk
        # contains busy rays in every screen region, so at the default
        # band width the whole chunk would march at its top rung cap and
        # forfeit the sorted full build's per-band rung savings (measured
        # ~2x total rebuild inflation at K=4).  K x smaller bands restore
        # rung granularity at chunk scope.
        band = max(TILE_L, (512 * 1024 // K) // TILE_L * TILE_L)
        st["views"].append(build_compact_view_device_step(
            self.grid, self.params, st["clip"], i * (H // K),
            config=self.config, steps=st["steps"], num_rows=H // K,
            march_cell=cell, band_lanes=band,
        ))
        if len(st["views"]) < K:
            # Fresh coarse frames keep flowing while the exact chunks
            # cook on the same device queue.
            self._motion_steps(n, max_steps)
            return False
        from ..render import color as color_mod

        self._view = color_mod.merge_row_views(st["views"])
        self._view_key = key
        self.view_exact = True
        self._settle = None
        return True

    # HBM budget for PATH's baked camera segment (PathView holds two
    # rays x steps planes); beyond it PATH renders uncached (the scatter
    # segments still run compacted either way).
    path_cache_budget_bytes: int = 1 << 31

    # PATH frames per dispatch (engine.step.render_path_steps_cached,
    # bit-identical to single steps).  Default 1: the scatter walk is
    # fetch-rate-bound, not dispatch-bound — batching x4/x8/x16 measured
    # 47-48 ms/frame vs 42.4 single at 256^2 on v5e (the F-times-wider
    # chunk ops pay F times the gather time, plus padding waste).
    path_frame_batch: int = 1

    def step(self, n: int = 1) -> RenderState:
        state = self._step(n)
        if self.lights is not None:
            self._maybe_warn_light_truncation()
        return state

    def _step(self, n: int = 1) -> RenderState:
        max_steps = self._max_steps
        if self.algorithm is Algorithm.PATH:
            # path_stride fast tier: scaled march step + roll probability,
            # original step for the light term (see _path_effective).
            p_eff, light_step, max_steps = self._path_effective(max_steps)
            lut_r = self._shadow_lut_radius()
            # Scatter-segment empty-space skipping: default 0 = auto-derive
            # the largest exact cell as the camera view build does
            # (cell*step <= one 8-voxel brick pitch).  On by default since
            # the arithmetic brick-table select made the cell test cheaper
            # than the fetches it skips (StaticConfig.path_march_cell).
            cell = self.config.path_march_cell
            if cell == 0:
                cell = max(
                    1,
                    int(8.0 // max(
                        float(p_eff.ray_marching_step_size), 1e-6)),
                )
            # PathView planes: rank_k u16 (2 B) + rank_prefix f32 (4 B)
            # per (ray, step).
            cache_bytes = (
                self.config.width * self.config.height * max_steps * 6
            )
            if (
                self.use_view_cache
                and cache_bytes <= self.path_cache_budget_bytes
            ):
                # Camera-drag frames skip the per-frame PathView re-bake
                # the same way the gather algorithms skip the view
                # rebuild (coarse mode only: the truncated short-cap
                # build is a CompactView construct with no PATH
                # counterpart).
                key = self._make_path_view_key(max_steps, lut_r,
                                               params=p_eff)
                moving = (
                    self.config.motion_mode == "coarse"
                    and self._path_view_key is not None
                    and key != self._path_view_key
                    and key != getattr(self, "_last_path_step_key", None)
                    and not getattr(self, "_suppress_motion_once", False)
                )
                self._suppress_motion_once = False
                self._last_path_step_key = key
                if moving:
                    return self._motion_steps(n, max_steps)
                if (
                    self.first_frame_uncached
                    and not self._ttff_done
                    and self._path_view is None
                    and self._path_view_key is None
                ):
                    # TTFF: virgin session presents frame 1 through the
                    # uncached program before paying the bake (__init__).
                    self._ttff_done = True
                    self.state, self.lights = render_step(
                        self.grid, p_eff, self.state,
                        algorithm=self.algorithm, config=self.config,
                        max_steps=max_steps,
                        gather_samples=self.gather_samples,
                        shadow_lut_radius=lut_r, march_cell=cell,
                        light_step=light_step,
                    )
                    n -= 1
                    if n <= 0:
                        return self.state
                cache = self._current_path_view(max_steps, lut_r,
                                                params=p_eff,
                                                light_step=light_step)
                remaining = n
                while remaining > 0:
                    k = (self.path_frame_batch
                         if remaining >= self.path_frame_batch else 1)
                    if k == 1:
                        self.state, self.lights = render_path_step_cached(
                            self.grid, p_eff, self.state, cache,
                            config=self.config, max_steps=max_steps,
                            shadow_lut_radius=lut_r, march_cell=cell,
                            light_step=light_step,
                        )
                    else:
                        self.state, self.lights = render_path_steps_cached(
                            self.grid, p_eff, self.state, cache,
                            config=self.config, max_steps=max_steps,
                            n_frames=k, shadow_lut_radius=lut_r,
                            march_cell=cell, light_step=light_step,
                        )
                    remaining -= k
            else:
                for _ in range(n):
                    self.state, self.lights = render_step(
                        self.grid, p_eff, self.state,
                        algorithm=self.algorithm, config=self.config,
                        max_steps=max_steps,
                        gather_samples=self.gather_samples,
                        shadow_lut_radius=lut_r, march_cell=cell,
                        light_step=light_step,
                    )
            return self.state
        cached = self.use_view_cache
        if cached:
            key = self._make_view_key(max_steps)
            suppress = getattr(self, "_suppress_motion_once", False)
            moving = (
                self.config.motion_mode != "off"
                and self._view_key is not None
                and key != self._view_key
                and key != getattr(self, "_last_step_key", None)
                and not suppress
            )
            self._suppress_motion_once = False
            self._last_step_key = key
            if moving:
                self._settle = None  # camera moved again: drop progress
                return self._motion_steps(n, max_steps)
            if (
                not suppress
                and key != self._view_key
                and (self._view_key is not None or self._settle is not None)
            ):
                # The camera just settled on a stale view: rebuild the
                # exact view progressively (one row chunk per tick, coarse
                # frames in between) instead of one blocking hitch.
                if not self._settle_step(key, max_steps, n):
                    return self.state
            if (
                self.first_frame_uncached
                and not self._ttff_done
                and self._view is None
                and self._view_key is None
                and self._settle is None
            ):
                # TTFF: virgin session presents frame 1 through the plain
                # uncached program — one compile before first pixels
                # instead of the view-build + cached-step pair (__init__).
                self._ttff_done = True
                self.state, self.lights = render_step(
                    self.grid, self.params, self.state,
                    algorithm=self.algorithm, config=self.config,
                    max_steps=max_steps,
                    gather_samples=self.gather_samples,
                )
                n -= 1
                if n <= 0:
                    return self.state
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
