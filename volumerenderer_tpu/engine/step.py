"""Per-frame render step — the TPU-native drawFrame (src/main.cpp:620-934).

The Vulkan frame graph (counter fill -> light-gen dispatch -> memory barrier
-> color dispatch -> image barrier -> blit) collapses into ordinary XLA
dataflow inside one jit: the color pass consumes the light-gen output, so the
compiler serializes exactly where the barriers did, and fuses everywhere
else.  Two-frames-in-flight pipelining falls out of JAX async dispatch; the
accumulation buffer is donated so the update is in-place in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..grid.dense import DenseGrid
from ..render import color as color_mod
from ..render import path as path_mod
from ..render import photon
from .params import Algorithm, RenderParams, StaticConfig
from .state import RenderState, accumulate


@functools.partial(
    jax.jit,
    static_argnames=("algorithm", "config", "max_steps", "gather_samples",
                     "shadow_lut_radius", "march_cell"),
    donate_argnames=("state",),
)
def render_step(
    grid: DenseGrid,
    params: RenderParams,
    state: RenderState,
    *,
    algorithm: Algorithm,
    config: StaticConfig,
    max_steps: int,
    gather_samples: int = 0,
    shadow_lut_radius: int = 0,
    march_cell: int = 1,
    light_step=None,
):
    """Advance one frame: returns (new_state, lights).

    Order matches drawFrame: frameCount++ first (src/main.cpp:712), clear on
    frame 1 (:731-808), regenerate lights every frame (counter fill :722-728
    — lights are NOT persisted across frames), render, accumulate.

    ``light_step``: PATH only — the original step for the light term when
    ``params`` carries a path_stride-scaled march step (render.path).
    """
    frame_count = state.frame_count + 1
    accum = jnp.where(frame_count == 1, 0.0, state.accum)

    if algorithm is Algorithm.PATH:
        lights = photon.empty_lights(config)
        frame = path_mod.render_frame(
            grid, params, frame_count, config, max_steps,
            shadow_lut_radius=shadow_lut_radius, march_cell=march_cell,
            light_step=light_step,
        )
    else:
        lights = photon.generate_lights(
            grid, params, frame_count, config, max_steps=max_steps
        )
        frame = color_mod.render_frame(
            grid,
            params,
            lights,
            algorithm,
            config,
            max_steps,
            gather_samples=gather_samples,
        )

    new_accum = accumulate(
        accum, frame, frame_count, quantize_u8=config.accum_dtype == "uint8"
    )
    return RenderState(accum=new_accum, frame_count=frame_count), lights


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "gather_samples",
                     "occupied_cap", "num_rows", "march_cell"),
)
def build_view_step(
    grid: DenseGrid,
    params: RenderParams,
    clip_box=None,
    row_start=0,
    *,
    config: StaticConfig,
    max_steps: int,
    gather_samples: int = 0,
    occupied_cap: int | None = None,
    num_rows: int | None = None,
    march_cell: int = 8,
):
    """Bake the per-view march (render.color.build_view) once per camera/
    volume/step change; reused by every subsequent cached frame.
    ``clip_box``: concrete occupied-region corners (session computes them
    host-side from the brick occupancy); ``occupied_cap``: per-ray
    occupied-sample bound for the brick-skipping march."""
    return color_mod.build_view(
        grid, params, config, max_steps, gather_samples, clip_box=clip_box,
        occupied_cap=occupied_cap, row_start=row_start, num_rows=num_rows,
        march_cell=march_cell,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "march_cell"),
)
def occupancy_probe_step(
    grid: DenseGrid,
    params: RenderParams,
    clip_box=None,
    *,
    config: StaticConfig,
    max_steps: int,
    march_cell: int = 8,
):
    """Brick-occupancy pre-pass (render.color.occupancy_probe):
    per-ray occupied fine-sample bounds (N,) — no volume fetches; zero
    means the ray can never see density, max bounds the march's
    occupied_cap."""
    return color_mod.occupancy_probe(
        grid, params, config, max_steps, clip_box=clip_box,
        march_cell=march_cell,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def camera_rays_index_step(
    grid: DenseGrid,
    params: RenderParams,
    *,
    config: StaticConfig,
):
    """Full-view index-space camera rays (render.color.camera_rays_index)."""
    return color_mod.camera_rays_index(grid, params, config)


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "march_cell"),
)
def occupancy_counts_rays_step(
    grid: DenseGrid,
    params: RenderParams,
    clip_box,
    o_i,
    d_i,
    *,
    config: StaticConfig,
    max_steps: int,
    march_cell: int = 8,
):
    """Occupancy bounds for an explicit ray set
    (render.color.occupancy_counts_rays)."""
    return color_mod.occupancy_counts_rays(
        grid, params, config, max_steps, o_i, d_i,
        clip_box=clip_box, march_cell=march_cell,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "gather_samples",
                     "occupied_cap", "march_cell"),
)
def build_view_rays_step(
    grid: DenseGrid,
    params: RenderParams,
    clip_box,
    o_i,
    d_i,
    *,
    config: StaticConfig,
    max_steps: int,
    gather_samples: int = 0,
    occupied_cap: int | None = None,
    march_cell: int = 8,
):
    """Bake the march for an explicit ray band (render.color.
    build_view_rays): (wx, wy, wz, w) planes, (N, C)."""
    return color_mod.build_view_rays(
        grid, params, config, max_steps, o_i, d_i,
        gather_samples=gather_samples, clip_box=clip_box,
        occupied_cap=occupied_cap, march_cell=march_cell,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "steps", "num_rows", "march_cell",
                     "band_lanes", "order"),
)
def build_compact_view_device_step(
    grid: DenseGrid,
    params: RenderParams,
    clip_box=None,
    row_start=0,
    *,
    config: StaticConfig,
    steps: int,
    num_rows: int | None = None,
    march_cell: int = 8,
    band_lanes: int = 512 * 1024,
    order: str = "occupancy",
):
    """One-dispatch, zero-host-sync compact-view build
    (render.color.build_compact_view_device): static shapes for every
    camera, so camera motion re-runs this exact compiled program.
    ``order="identity"`` additionally skips the occupancy pre-march +
    lane sort (for single-use mid-drag views)."""
    return color_mod.build_compact_view_device(
        grid, params, config, steps, clip_box=clip_box,
        row_start=row_start, num_rows=num_rows, march_cell=march_cell,
        band_lanes=band_lanes, order=order,
    )


@functools.partial(jax.jit, donate_argnames=("wx", "wy", "wz", "w"))
def band_from_planes_step(wx, wy, wz, w):
    """(N, C) ray-band planes -> lane-layout PlaneBand (transpose + sublane
    pad; plane buffers donated — they are only needed as the source).

    lane_need comes from the planes themselves (last nonzero weight + 1),
    NOT the occupancy bound: the true support is typically much tighter
    (no transmittance-cutoff tail, no dilation slack), and it is what the
    shade kernels' per-block slab bounds should hug."""
    C = wx.shape[1]
    padC = (-C) % 8
    nz = w != 0.0
    need = jnp.where(
        jnp.any(nz, axis=-1), C - jnp.argmax(nz[:, ::-1], axis=-1), 0
    ).astype(jnp.int32)
    tr = lambda a: (jnp.pad(a, ((0, 0), (0, padC))) if padC else a).T
    return color_mod.PlaneBand(
        wx=tr(wx), wy=tr(wy), wz=tr(wz), weight=tr(w), lane_need=need,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "occupied_cap", "num_rows",
                     "march_cell"),
)
def probe_view_step(
    grid: DenseGrid,
    params: RenderParams,
    clip_box=None,
    row_start=0,
    *,
    config: StaticConfig,
    max_steps: int,
    occupied_cap: int | None = None,
    num_rows: int | None = None,
    march_cell: int = 8,
):
    """March statistics pre-pass (render.color.probe_view): (max nonzero
    samples on any ray, total nonzero, hit rays) — sizes the exact view
    cache."""
    return color_mod.probe_view(
        grid, params, config, max_steps, clip_box=clip_box,
        occupied_cap=occupied_cap, row_start=row_start, num_rows=num_rows,
        march_cell=march_cell,
    )


@functools.partial(
    jax.jit, static_argnames=("capacity",), donate_argnames=("view",)
)
def compact_view_step(view, *, capacity: int):
    """Globally compact a baked view (render.color.compact_view).  The
    input planes are donated — at bunny_cloud scale they are gigabytes and
    only needed as the gather source."""
    return color_mod.compact_view(view, capacity)


@functools.partial(
    jax.jit,
    static_argnames=("algorithm", "config", "max_steps"),
    donate_argnames=("state",),
)
def render_step_cached(
    grid: DenseGrid,
    params: RenderParams,
    state: RenderState,
    view,
    *,
    algorithm: Algorithm,
    config: StaticConfig,
    max_steps: int,
):
    """Steady-state frame for the gather algorithms: photon-walk light gen +
    shade of the baked view + accumulation.  No volume fetches on the pixel
    path — the march lives in ``view`` (see render.color.ViewCache)."""
    frame_count = state.frame_count + 1
    accum = jnp.where(frame_count == 1, 0.0, state.accum)
    lights = photon.generate_lights(
        grid, params, frame_count, config, max_steps=max_steps
    )
    frame = color_mod.shade_view(
        grid, view, params, lights, algorithm, config
    )
    new_accum = accumulate(
        accum, frame, frame_count, quantize_u8=config.accum_dtype == "uint8"
    )
    return RenderState(accum=new_accum, frame_count=frame_count), lights


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "shadow_lut_radius"),
)
def bake_path_view_step(
    grid: DenseGrid,
    params: RenderParams,
    *,
    config: StaticConfig,
    max_steps: int,
    shadow_lut_radius: int = 0,
    light_step=None,
):
    """Bake PATH's frame-invariant camera-segment planes
    (render.path.bake_path_view) once per camera/volume/light change."""
    return path_mod.bake_path_view(
        grid, params, config, max_steps,
        shadow_lut_radius=shadow_lut_radius, light_step=light_step,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "shadow_lut_radius",
                     "march_cell"),
    donate_argnames=("state",),
)
def render_path_step_cached(
    grid: DenseGrid,
    params: RenderParams,
    state: RenderState,
    cache,
    *,
    config: StaticConfig,
    max_steps: int,
    shadow_lut_radius: int = 0,
    march_cell: int = 1,
    light_step=None,
):
    """Steady-state PATH frame: camera segment from the baked PathView
    (RNG + prefix lookup, zero volume fetches), compacted scatter
    segments, accumulation.  Identical results to render_step."""
    frame_count = state.frame_count + 1
    accum = jnp.where(frame_count == 1, 0.0, state.accum)
    lights = photon.empty_lights(config)
    frame = path_mod.render_frame(
        grid, params, frame_count, config, max_steps,
        shadow_lut_radius=shadow_lut_radius, cache=cache,
        march_cell=march_cell, light_step=light_step,
    )
    new_accum = accumulate(
        accum, frame, frame_count, quantize_u8=config.accum_dtype == "uint8"
    )
    return RenderState(accum=new_accum, frame_count=frame_count), lights


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "shadow_lut_radius",
                     "march_cell", "n_frames"),
    donate_argnames=("state",),
)
def render_path_steps_cached(
    grid: DenseGrid,
    params: RenderParams,
    state: RenderState,
    cache,
    *,
    config: StaticConfig,
    max_steps: int,
    n_frames: int,
    shadow_lut_radius: int = 0,
    march_cell: int = 1,
    light_step=None,
):
    """``n_frames`` steady-state PATH frames as ONE dispatch, scatter
    segments batched ACROSS frames (render.path.render_frames): per-op
    shapes grow n_frames-fold, amortizing the per-op dispatch overhead
    that dominates small-image PATH.  The accumulation update is applied
    sequentially per frame — bit-identical to n_frames single steps."""
    fcs = state.frame_count + 1 + jnp.arange(n_frames, dtype=jnp.int32)
    frames = path_mod.render_frames(
        grid, params, fcs, config, max_steps, cache,
        shadow_lut_radius=shadow_lut_radius, march_cell=march_cell,
        light_step=light_step,
    )
    accum = state.accum
    for i in range(n_frames):
        fc = fcs[i]
        accum = jnp.where(fc == 1, 0.0, accum)
        accum = accumulate(
            accum, frames[i], fc, quantize_u8=config.accum_dtype == "uint8"
        )
    return (
        RenderState(accum=accum, frame_count=state.frame_count + n_frames),
        photon.empty_lights(config),
    )


@functools.partial(
    jax.jit,
    static_argnames=("algorithm", "config", "max_steps", "n_frames"),
    donate_argnames=("state",),
)
def render_steps_cached(
    grid: DenseGrid,
    params: RenderParams,
    state: RenderState,
    view,
    *,
    algorithm: Algorithm,
    config: StaticConfig,
    max_steps: int,
    n_frames: int,
):
    """``n_frames`` cached frames in ONE dispatch (lax.fori_loop) — the
    multi-frames-in-flight analogue of the reference's
    MAX_FRAMES_IN_FLIGHT=2 pipelining (src/main.cpp:44): amortizes the
    per-launch round-trip (significant on remote/tunneled TPUs).

    The photon walks of all frames run FIRST, vmapped into one batch of
    n_frames x 16 photons — each frame's walk is independent (pure function
    of its frame counter), and batching turns 16-wide sequential walks into
    one wide parallel walk.

    With a CompactView the whole batch ACCUMULATES IN COMPACT SPACE: each
    frame updates only the (Rc,) hit-ray vector and one image-space
    expansion runs at batch end — the miss pixels' progressive average of
    all-zero frames collapses to a single scale by m/(m+n).
    """
    fcs = state.frame_count + 1 + jnp.arange(n_frames, dtype=jnp.int32)
    lights_batch = jax.vmap(
        lambda fc: photon.generate_lights(
            grid, params, fc, config, max_steps=max_steps
        )
    )(fcs)

    if (
        isinstance(view, color_mod.CompactView)
        and config.accum_dtype != "uint8"
    ):
        H, W = config.height, config.width
        m = state.frame_count
        accum_flat = state.accum.reshape(-1)
        accum_c = jnp.take(accum_flat, view.src, mode="clip")

        def body_c(i, accum_c):
            fc = fcs[i]
            lights = jax.tree.map(lambda x: x[i], lights_batch)
            frame_c = color_mod.shade_view_compact(
                grid, view, params, lights, algorithm, config
            )
            accum_c = jnp.where(fc == 1, 0.0, accum_c)
            return accumulate(accum_c, frame_c, fc)

        accum_c = jax.lax.fori_loop(0, n_frames, body_c, accum_c)
        fc_end = m + n_frames
        # Miss pixels averaged zero frames: mean_n = mean_m * m/n (exactly
        # 0 if a clear happened, i.e. m == 0).
        factor = jnp.where(
            m == 0, 0.0, m.astype(jnp.float32) / fc_end.astype(jnp.float32)
        )
        expanded = color_mod.expand_compact_colors(accum_c, view)
        hit = (view.inv_map < view.src.shape[0])[: view.n_rays]
        new_flat = jnp.where(hit, expanded, accum_flat * factor)
        lights = jax.tree.map(lambda x: x[n_frames - 1], lights_batch)
        return (
            RenderState(accum=new_flat.reshape(H, W), frame_count=fc_end),
            lights,
        )

    def body(i, carry):
        accum, _fc, _lights = carry
        fc = fcs[i]
        accum = jnp.where(fc == 1, 0.0, accum)
        lights = jax.tree.map(lambda x: x[i], lights_batch)
        frame = color_mod.shade_view(
            grid, view, params, lights, algorithm, config
        )
        accum = accumulate(
            accum, frame, fc, quantize_u8=config.accum_dtype == "uint8"
        )
        return accum, fc, lights

    init = (state.accum, state.frame_count, photon.empty_lights(config))
    accum, fc, lights = jax.lax.fori_loop(0, n_frames, body, init)
    return RenderState(accum=accum, frame_count=fc), lights
