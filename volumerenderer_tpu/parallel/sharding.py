"""Multi-chip rendering via jax.sharding — the scaling layer the single-GPU
reference never had (SURVEY.md §2.3, §5.8).

Two shardings, composable on a 2-D mesh ('rows', 'lights'):

  * **Pixel-row data parallelism** ('rows'): the accumulation image is
    sharded by rows; each device renders its horizontal band of the shared
    pinhole projection (ops.camera.camera_rays row slicing is exact).
    Embarrassingly parallel — zero collectives in steady state; the only
    cross-device traffic is the (tiny) replicated light array, which every
    device regenerates deterministically instead of receiving (16-photon
    walk << one broadcast).
  * **Light-axis sharding** ('lights'): the many-light gather is this
    renderer's long-context analogue (O(lights) per sample).  Each device
    gathers radiance from its shard of the light array and the partial sums
    are combined with one ``psum`` over ICI — flash-attention-style blockwise
    accumulation across chips.

The Vulkan reference's barriers/atomics have no equivalent here: XLA
dataflow orders the light-gen -> gather handoff, and the photon append is
already deterministic (render.photon).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.params import Algorithm, RenderParams, StaticConfig
from ..engine.state import RenderState, accumulate
from ..grid.dense import DenseGrid
from ..render import color as color_mod
from ..render import path as path_mod
from ..render import photon


def make_mesh(devices: Sequence[jax.Device] | None = None, lights_axis: int = 1) -> Mesh:
    """1-D 'rows' mesh by default; set ``lights_axis`` > 1 for a 2-D
    ('rows', 'lights') mesh."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % lights_axis:
        raise ValueError(f"{n} devices not divisible by lights_axis={lights_axis}")
    arr = np.array(devices).reshape(n // lights_axis, lights_axis)
    return Mesh(arr, ("rows", "lights"))


def _device_render(
    accum_local,
    frame_count,
    grid,
    params,
    *,
    algorithm,
    config,
    local_rows,
    max_steps,
    gather_samples,
    shadow_lut_radius=0,
    march_cell=1,
):
    """Per-device body (inside shard_map): render this device's row band.

    The FULL config goes through untouched — render_frame's projection math
    must see the global image height; num_rows selects the band.
    ``shadow_lut_radius``/``march_cell`` reach PATH's uncached frame so the
    sharded step can match the single-chip step's per-step knobs exactly
    (the coarse motion path re-derives both for the strided step size).
    """
    row0 = jax.lax.axis_index("rows") * local_rows

    if algorithm is Algorithm.PATH:
        frame = path_mod.render_frame(
            grid, params, frame_count, config, max_steps,
            row_start=row0, num_rows=local_rows,
            shadow_lut_radius=shadow_lut_radius, march_cell=march_cell,
        )
    else:
        # Deterministic photon walk: every device computes the identical
        # light array (cheaper than broadcasting; no collective needed).
        lights = photon.generate_lights(
            grid, params, frame_count, config, max_steps=max_steps
        )
        frame = color_mod.render_frame(
            grid, params, lights, algorithm, config, max_steps,
            gather_samples=gather_samples,
            row_start=row0, num_rows=local_rows,
        )

    accum_local = jnp.where(frame_count == 1, 0.0, accum_local)
    return accumulate(
        accum_local, frame, frame_count,
        quantize_u8=config.accum_dtype == "uint8",
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "algorithm", "config", "max_steps", "gather_samples", "mesh",
        "shadow_lut_radius", "march_cell",
    ),
    donate_argnames=("state",),
)
def sharded_render_step(
    grid: DenseGrid,
    params: RenderParams,
    state: RenderState,
    *,
    algorithm: Algorithm,
    config: StaticConfig,
    max_steps: int,
    mesh: Mesh,
    gather_samples: int = 0,
    shadow_lut_radius: int = 0,
    march_cell: int = 1,
) -> RenderState:
    """One multi-chip frame: accum sharded by rows, grid/params replicated."""
    n_rows_shards = mesh.shape["rows"]
    if config.height % n_rows_shards:
        raise ValueError(
            f"height {config.height} not divisible by mesh rows {n_rows_shards}"
        )
    local_rows = config.height // n_rows_shards
    frame_count = state.frame_count + 1

    body = functools.partial(
        _device_render,
        algorithm=algorithm,
        config=config,
        local_rows=local_rows,
        max_steps=max_steps,
        gather_samples=gather_samples,
        shadow_lut_radius=shadow_lut_radius,
        march_cell=march_cell,
    )
    new_accum = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("rows", None), P(), P(), P()),
        out_specs=P("rows", None),
        check_vma=False,
    )(state.accum, frame_count, grid, params)
    return RenderState(accum=new_accum, frame_count=frame_count)


@functools.partial(
    jax.jit,
    static_argnames=("algorithm", "config", "max_steps", "gather_samples", "mesh"),
)
def light_sharded_radiance(
    grid: DenseGrid,
    params: RenderParams,
    state: RenderState,
    *,
    algorithm: Algorithm,
    config: StaticConfig,
    max_steps: int,
    mesh: Mesh,
    gather_samples: int = 0,
) -> jax.Array:
    """Radiance field with the LIGHT axis sharded over mesh axis 'lights'.

    Each device gathers its light shard's contribution to every pixel of its
    row band; one psum over 'lights' combines the partial sums.  Returns the
    un-accumulated frame (rows sharded, lights reduced) — the context-
    parallelism analogue for many-light scaling (SURVEY.md §5.7).
    """
    n_rows = mesh.shape["rows"]
    n_ls = mesh.shape["lights"]
    local_rows = config.height // n_rows
    frame_count = state.frame_count + 1

    def body(grid, params, frame_count):
        row0 = jax.lax.axis_index("rows") * local_rows
        li = jax.lax.axis_index("lights")
        lights = photon.generate_lights(
            grid, params, frame_count, config, max_steps=max_steps
        )
        L = config.light_capacity
        shard = L // n_ls
        slot = jnp.arange(L)
        mine = (slot >= li * shard) & (slot < (li + 1) * shard)
        my_lights = lights._replace(valid=lights.valid & mine)
        # Un-normalized, un-clipped radiance sums for my shard of lights;
        # exact: clip(psum(partials)/count) == the single-device result.
        frame = color_mod.render_frame(
            grid, params, my_lights, algorithm, config, max_steps,
            gather_samples=gather_samples,
            row_start=row0, num_rows=local_rows, normalize=False,
        )
        total = jax.lax.psum(frame, "lights")
        denom = jnp.maximum(lights.count, 1).astype(jnp.float32)
        return jnp.clip(total / denom, 0.0, 1.0)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P("rows", None),
        check_vma=False,
    )(grid, params, frame_count)


def replicate(mesh: Mesh, tree):
    """Place a pytree replicated on every device of the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_rows(mesh: Mesh, array):
    """Shard a (H, ...) array across the 'rows' mesh axis."""
    return jax.device_put(array, NamedSharding(mesh, P("rows")))


# ---------------------------------------------------------------------------
# Cached multi-chip rendering: per-device ViewCache + sharded shading.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "gather_samples", "mesh"),
)
def build_view_sharded(
    grid: DenseGrid,
    params: RenderParams,
    *,
    config: StaticConfig,
    max_steps: int,
    mesh: Mesh,
    gather_samples: int = 0,
):
    """Bake each device's row band of the march (render.color.build_view) —
    the multi-chip version of the view cache.  Returns a dict of arrays
    sharded by 'rows' (plane coords + weights)."""
    n_rows_shards = mesh.shape["rows"]
    if config.height % n_rows_shards:
        raise ValueError("height must divide mesh rows")
    local_rows = config.height // n_rows_shards

    def body(grid, params):
        row0 = jax.lax.axis_index("rows") * local_rows
        v = color_mod.build_view(
            grid, params, config, max_steps, gather_samples,
            row_start=row0, num_rows=local_rows,
        )
        return dict(wx=v.wx, wy=v.wy, wz=v.wz, weight=v.weight)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=dict(
            wx=P("rows"), wy=P("rows"), wz=P("rows"), weight=P("rows")
        ),
        check_vma=False,
    )(grid, params)


@functools.partial(
    jax.jit,
    static_argnames=("algorithm", "config", "max_steps", "mesh", "n_frames"),
    donate_argnames=("state",),
)
def sharded_shade_step(
    grid: DenseGrid,
    params: RenderParams,
    state: RenderState,
    view_arrays,
    *,
    algorithm: Algorithm,
    config: StaticConfig,
    max_steps: int,
    mesh: Mesh,
    n_frames: int = 1,
) -> RenderState:
    """``n_frames`` cached multi-chip frames in ONE dispatch: every device
    regenerates the (tiny) photon walks of all frames up front (vmapped,
    like engine.step.render_steps_cached), shades ITS row band from ITS
    baked view shard frame by frame (lax.fori_loop), and — when the mesh
    has a 'lights' axis — gathers only its light shard, combining partial
    radiance with one psum over ICI per frame.  Single-dispatch batching
    amortizes the per-launch round-trip exactly like the single-chip path
    (the reference's MAX_FRAMES_IN_FLIGHT analogue, src/main.cpp:44)."""
    n_rows_shards = mesh.shape["rows"]
    n_light_shards = mesh.shape.get("lights", 1)
    local_rows = config.height // n_rows_shards

    def body(accum_local, frame_count0, va, grid, params):
        fcs = frame_count0 + 1 + jnp.arange(n_frames, dtype=jnp.int32)
        lights_batch = jax.vmap(
            lambda fc: photon.generate_lights(
                grid, params, fc, config, max_steps=max_steps
            )
        )(fcs)
        view = color_mod.ViewCache(
            wx=va["wx"], wy=va["wy"], wz=va["wz"], weight=va["weight"],
            n_rays=local_rows * config.width, rows=local_rows,
        )

        def frame_body(i, accum_local):
            fc = fcs[i]
            lights = jax.tree.map(lambda x: x[i], lights_batch)
            if n_light_shards > 1:
                li = jax.lax.axis_index("lights")
                L = config.light_capacity
                shard = L // n_light_shards
                slot = jnp.arange(L)
                mine = (slot >= li * shard) & (slot < (li + 1) * shard)
                my_lights = lights._replace(valid=lights.valid & mine)
                raw = color_mod.shade_view(
                    grid, view, params, my_lights, algorithm, config,
                    normalize=False,
                )
                total = jax.lax.psum(raw, "lights")
                denom = jnp.maximum(lights.count, 1).astype(jnp.float32)
                frame = jnp.clip(total / denom, 0.0, 1.0)
            else:
                frame = color_mod.shade_view(
                    grid, view, params, lights, algorithm, config
                )
            accum_local = jnp.where(fc == 1, 0.0, accum_local)
            return accumulate(
                accum_local, frame, fc,
                quantize_u8=config.accum_dtype == "uint8",
            )

        return jax.lax.fori_loop(0, n_frames, frame_body, accum_local)

    view_specs = dict(
        wx=P("rows"), wy=P("rows"), wz=P("rows"), weight=P("rows")
    )
    new_accum = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("rows", None), P(), view_specs, P(), P()),
        out_specs=P("rows", None),
        check_vma=False,
    )(state.accum, state.frame_count, view_arrays, grid, params)
    return RenderState(
        accum=new_accum, frame_count=state.frame_count + n_frames
    )


# ---------------------------------------------------------------------------
# Round-2 fast paths, multi-chip (VERDICT r2 #6): per-device CompactView
# (the zero-host-sync device build runs INSIDE shard_map — every lane
# decision is a device op with static shapes, so it shards trivially) and
# per-device PATH PathView.
# ---------------------------------------------------------------------------


def _n_bands(config: StaticConfig, local_rows: int,
             band_lanes: int = 512 * 1024) -> int:
    from ..ops.pallas.gather_lanes import TILE_L

    n_rays_l = local_rows * config.width
    lanes_n = -(-n_rays_l // TILE_L) * TILE_L
    return -(-lanes_n // band_lanes)


@functools.partial(
    jax.jit,
    static_argnames=("config", "steps", "mesh", "march_cell"),
)
def build_compact_view_sharded(
    grid: DenseGrid,
    params: RenderParams,
    clip_box,
    *,
    config: StaticConfig,
    steps: int,
    mesh: Mesh,
    march_cell: int = 8,
):
    """Each device bakes the COMPACT view of its row band
    (render.color.build_compact_view_device under shard_map): occupied-bbox
    clip, brick-skipping march, lane compaction — the same fast path the
    single-chip session uses, now sharded.  Returns a dict of arrays with
    the lane axes sharded by 'rows'; reassembled per device at shade time.
    ``clip_box``: concrete occupied-region corners (pass the full bbox when
    unknown — bit-identical to no clip)."""
    n_rows_shards = mesh.shape["rows"]
    if config.height % n_rows_shards:
        raise ValueError("height must divide mesh rows")
    local_rows = config.height // n_rows_shards

    def body(grid, params, clip):
        row0 = jax.lax.axis_index("rows") * local_rows
        v = color_mod.build_compact_view_device(
            grid, params, config, steps, clip_box=clip,
            row_start=row0, num_rows=local_rows, march_cell=march_cell,
        )
        out = dict(inv_map=v.inv_map, src=v.src)
        for i, b in enumerate(v.bands):
            out[f"b{i}"] = dict(
                wx=b.wx, wy=b.wy, wz=b.wz, weight=b.weight,
                lane_need=b.lane_need,
            )
        return out

    band_spec = dict(
        wx=P(None, "rows"), wy=P(None, "rows"), wz=P(None, "rows"),
        weight=P(None, "rows"), lane_need=P("rows"),
    )
    out_specs = dict(
        inv_map=P("rows"), src=P("rows"),
        **{f"b{i}": band_spec for i in range(_n_bands(config, local_rows))},
    )
    clip = (
        jnp.asarray(clip_box[0], jnp.float32),
        jnp.asarray(clip_box[1], jnp.float32),
    )
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), (P(), P())),
        out_specs=out_specs,
        check_vma=False,
    )(grid, params, clip)


@functools.partial(
    jax.jit,
    static_argnames=("algorithm", "config", "max_steps", "mesh", "n_frames"),
    donate_argnames=("state",),
)
def sharded_shade_compact_step(
    grid: DenseGrid,
    params: RenderParams,
    state: RenderState,
    view_arrays,
    *,
    algorithm: Algorithm,
    config: StaticConfig,
    max_steps: int,
    mesh: Mesh,
    n_frames: int = 1,
) -> RenderState:
    """``n_frames`` compact cached frames in ONE dispatch, sharded: every
    device accumulates its row band IN COMPACT SPACE (only its hit-ray
    vector updates per frame; one image-space expansion per batch — the
    multi-chip twin of engine.step.render_steps_cached), with the light
    axis optionally sharded via one psum per frame over ICI."""
    if config.accum_dtype == "uint8":
        raise ValueError("compact sharded shading needs f32 accumulation")
    n_rows_shards = mesh.shape["rows"]
    n_light_shards = mesh.shape.get("lights", 1)
    local_rows = config.height // n_rows_shards
    W = config.width
    n_rays_l = local_rows * W

    def body(accum_local, fc0, va, grid, params):
        bands = []
        for i in range(_n_bands(config, local_rows)):
            b = va[f"b{i}"]
            bands.append(color_mod.PlaneBand(
                wx=b["wx"], wy=b["wy"], wz=b["wz"], weight=b["weight"],
                lane_need=b["lane_need"],
            ))
        view = color_mod.CompactView(
            bands=tuple(bands), inv_map=va["inv_map"], src=va["src"],
            n_rays=n_rays_l, rows=local_rows,
        )
        fcs = fc0 + 1 + jnp.arange(n_frames, dtype=jnp.int32)
        lights_batch = jax.vmap(
            lambda fc: photon.generate_lights(
                grid, params, fc, config, max_steps=max_steps
            )
        )(fcs)
        accum_flat = accum_local.reshape(-1)
        accum_c = jnp.take(accum_flat, view.src, mode="clip")

        def frame_body(i, accum_c):
            fc = fcs[i]
            lights = jax.tree.map(lambda x: x[i], lights_batch)
            if n_light_shards > 1:
                li = jax.lax.axis_index("lights")
                L = config.light_capacity
                shard = L // n_light_shards
                slot = jnp.arange(L)
                mine = (slot >= li * shard) & (slot < (li + 1) * shard)
                my_lights = lights._replace(valid=lights.valid & mine)
                raw = color_mod._ray_radiance(
                    grid, view, params, my_lights, algorithm, config
                )
                total = jax.lax.psum(raw, "lights")
                denom = jnp.maximum(lights.count, 1).astype(jnp.float32)
                frame_c = jnp.clip(total / denom, 0.0, 1.0)
            else:
                frame_c = color_mod.shade_view_compact(
                    grid, view, params, lights, algorithm, config
                )
            accum_c = jnp.where(fc == 1, 0.0, accum_c)
            return accumulate(accum_c, frame_c, fc)

        accum_c = jax.lax.fori_loop(0, n_frames, frame_body, accum_c)
        fc_end = fc0 + n_frames
        factor = jnp.where(
            fc0 == 0, 0.0,
            fc0.astype(jnp.float32) / fc_end.astype(jnp.float32),
        )
        expanded = color_mod.expand_compact_colors(accum_c, view)
        hit = (view.inv_map < view.src.shape[0])[:n_rays_l]
        new_flat = jnp.where(hit, expanded, accum_flat * factor)
        return new_flat.reshape(local_rows, W)

    band_spec = dict(
        wx=P(None, "rows"), wy=P(None, "rows"), wz=P(None, "rows"),
        weight=P(None, "rows"), lane_need=P("rows"),
    )
    view_specs = dict(
        inv_map=P("rows"), src=P("rows"),
        **{f"b{i}": band_spec for i in range(_n_bands(config, local_rows))},
    )
    new_accum = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("rows", None), P(), view_specs, P(), P()),
        out_specs=P("rows", None),
        check_vma=False,
    )(state.accum, state.frame_count, view_arrays, grid, params)
    return RenderState(
        accum=new_accum, frame_count=state.frame_count + n_frames
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "mesh", "shadow_lut_radius"),
)
def bake_path_view_sharded(
    grid: DenseGrid,
    params: RenderParams,
    *,
    config: StaticConfig,
    max_steps: int,
    mesh: Mesh,
    shadow_lut_radius: int = 0,
):
    """Each device bakes PATH's frame-invariant camera segment for its row
    band (render.path.bake_path_view under shard_map) — the multi-chip
    PathView.  Returns the PathView fields as a dict sharded by 'rows'."""
    local_rows = config.height // mesh.shape["rows"]

    def body(grid, params):
        row0 = jax.lax.axis_index("rows") * local_rows
        return path_mod.bake_path_view(
            grid, params, config, max_steps,
            row_start=row0, num_rows=local_rows,
            shadow_lut_radius=shadow_lut_radius,
        )._asdict()

    fields = path_mod.PathView._fields
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P()),
        out_specs={k: P("rows") for k in fields},
        check_vma=False,
    )(grid, params)


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_steps", "mesh", "shadow_lut_radius"),
    donate_argnames=("state",),
)
def sharded_path_step_cached(
    grid: DenseGrid,
    params: RenderParams,
    state: RenderState,
    cache_arrays,
    *,
    config: StaticConfig,
    max_steps: int,
    mesh: Mesh,
    shadow_lut_radius: int = 0,
) -> RenderState:
    """One cached multi-chip PATH frame: each device renders its row band
    from its baked PathView shard (RNG + prefix lookup camera segment,
    compacted scatter segments) — the sharded twin of
    engine.step.render_path_step_cached."""
    local_rows = config.height // mesh.shape["rows"]

    def body(accum_local, fc0, ca, grid, params):
        cache = path_mod.PathView(**ca)
        fc = fc0 + 1
        row0 = jax.lax.axis_index("rows") * local_rows
        frame = path_mod.render_frame(
            grid, params, fc, config, max_steps,
            row_start=row0, num_rows=local_rows,
            shadow_lut_radius=shadow_lut_radius, cache=cache,
        )
        accum_local = jnp.where(fc == 1, 0.0, accum_local)
        return accumulate(
            accum_local, frame, fc,
            quantize_u8=config.accum_dtype == "uint8",
        )

    fields = path_mod.PathView._fields
    new_accum = jax.shard_map(
        body, mesh=mesh,
        in_specs=(
            P("rows", None), P(), {k: P("rows") for k in fields}, P(), P(),
        ),
        out_specs=P("rows", None),
        check_vma=False,
    )(state.accum, state.frame_count, cache_arrays, grid, params)
    return RenderState(
        accum=new_accum, frame_count=state.frame_count + 1
    )


class MeshRenderer:
    """Multi-chip interactive session: the Renderer equivalent over a device
    mesh — view baked per device once, then cached sharded frames batched
    ``frame_batch`` per dispatch.  The baked view tracks the same dependency
    key as the single-chip Renderer (camera/march params), so parameter
    edits after the first step re-bake instead of silently shading a stale
    march."""

    # Cached frames per dispatch (launch round-trip amortization).
    frame_batch: int = 8

    def __init__(self, grid, mesh: Mesh, config: StaticConfig,
                 params: RenderParams, algorithm: Algorithm,
                 gather_samples: int | None = None):
        import math

        import numpy as np

        from ..grid.dense import occupied_bbox
        from ..render.color import required_march_steps

        # Occupied clip + step bound, concrete at setup (same derivation as
        # engine.session._occupied_clip) — the compact sharded build clips
        # and brick-skips exactly like the single-chip session.
        box = occupied_bbox(grid)
        if box is None:
            box = (
                np.asarray(grid.bbox_min, np.float32),
                np.asarray(grid.bbox_max, np.float32) + 1.0,
            )
        self._clip = box
        self._occ_diag = float(np.linalg.norm(box[1] - box[0]))
        if config.motion_mode not in ("off", "coarse"):
            raise ValueError(
                "MeshRenderer supports motion_mode 'off' or 'coarse' only; "
                "'truncated' is the single-chip short-cap CompactView build "
                f"(got {config.motion_mode!r})"
            )

        self.grid = replicate(mesh, grid)
        self.mesh = mesh
        self.config = config
        self.params = params
        self.algorithm = algorithm
        self.gather_samples = (
            config.gather_samples if gather_samples is None else gather_samples
        )
        self.max_steps = required_march_steps(
            grid, float(params.ray_marching_step_size), config.max_march_steps
        )
        self._steps_bound = lambda: max(1, min(
            int(math.ceil(
                self._occ_diag / float(self.params.ray_marching_step_size)
            )) + 3,
            self.max_steps,
        ))
        self.state = RenderState.create(config.height, config.width)
        self.state = self.state.replace(
            accum=shard_rows(mesh, self.state.accum)
        )
        self._view = None
        self._view_key = None
        self._path_view = None
        self._path_view_key = None

    @property
    def _use_compact(self) -> bool:
        """The round-2 fast path (occupied clip + brick-skipping march +
        lane-compacted shade) applies whenever the view is exact-uncapped
        and accumulation is f32 (compact-space accumulation)."""
        return (
            self.config.compact_view
            and self.gather_samples == 0
            and self.config.accum_dtype != "uint8"
        )

    def _march_key(self):
        """Fields the baked march depends on (mirrors Renderer._current_view)."""
        import numpy as np

        return (
            tuple(np.asarray(self.params.camera_pos, np.float32).tolist()),
            tuple(np.asarray(self.params.camera_rotation).reshape(-1).tolist()),
            float(self.params.fov),
            float(self.params.ray_max_distance),
            float(self.params.ray_marching_step_size),
            float(self.params.absorption_coefficient),
            self.gather_samples,
        )

    def _current_view(self):
        key = self._march_key()
        if self._view is None or key != self._view_key:
            self._view = None
            if self._use_compact:
                cell = max(1, int(
                    8.0 // max(float(self.params.ray_marching_step_size),
                               1e-6)
                ))
                self._view = build_compact_view_sharded(
                    self.grid, self.params, self._clip, config=self.config,
                    steps=self._steps_bound(), mesh=self.mesh,
                    march_cell=cell,
                )
            else:
                self._view = build_view_sharded(
                    self.grid, self.params, config=self.config,
                    max_steps=self.max_steps, mesh=self.mesh,
                    gather_samples=self.gather_samples,
                )
            self._view_key = key
        return self._view

    def _shadow_lut_radius(self) -> int:
        import math

        from ..engine.params import Fidelity

        if self.config.fidelity is not Fidelity.REFERENCE:
            return 0
        r = math.ceil(float(self.params.ray_marching_step_size))
        return r if 0 < r <= self.config.shadow_lut_max_radius else 0

    def _path_key(self, lut_radius: int):
        """PathView cache key (mirrors Renderer._make_path_view_key)."""
        import numpy as np

        return (
            tuple(np.asarray(self.params.camera_pos, np.float32).tolist()),
            tuple(np.asarray(self.params.camera_rotation)
                  .reshape(-1).tolist()),
            float(self.params.fov),
            float(self.params.ray_max_distance),
            float(self.params.ray_marching_step_size),
            float(self.params.absorption_coefficient),
            tuple(np.asarray(self.params.light_source_world_pos,
                             np.float32).tolist()),
            float(self.params.photon_initial_intensity),
            lut_radius,
        )

    def _current_path_view(self, lut_radius: int):
        """Multi-chip PathView, keyed like Renderer._current_path_view."""
        key = self._path_key(lut_radius)
        if self._path_view is None or key != self._path_view_key:
            self._path_view = bake_path_view_sharded(
                self.grid, self.params, config=self.config,
                max_steps=self.max_steps, mesh=self.mesh,
                shadow_lut_radius=lut_radius,
            )
            self._path_view_key = key
        return self._path_view

    # PATH cache budget, same derivation as Renderer.path_cache_budget_bytes
    path_cache_budget_bytes: int = 1 << 31

    def _motion_steps(self, n: int) -> RenderState:
        """Camera-in-motion frames, multi-chip: the same coarse degraded
        path as Renderer._motion_steps — full depth at motion_stride x the
        step size through the plain (uncached) sharded step, no view
        rebuild — so sharded drag frames are bit-equal to single-chip drag
        frames (tests/test_sharding.py::test_mesh_renderer_motion_coarse).
        Only "coarse" exists here; __init__ rejects "truncated" (a
        single-chip short-cap CompactView construct)."""
        import math

        import numpy as np

        from ..engine.params import Fidelity
        from ..render.color import required_march_steps

        stride = max(1, int(self.config.motion_stride))
        coarse = float(self.params.ray_marching_step_size) * stride
        params = self.params.replace(
            ray_marching_step_size=np.float32(coarse))
        steps = required_march_steps(
            self.grid, coarse, self.config.max_march_steps)
        kw = {}
        if self.algorithm is Algorithm.PATH:
            r = math.ceil(coarse)
            kw["shadow_lut_radius"] = (
                r if self.config.fidelity is Fidelity.REFERENCE
                and 0 < r <= self.config.shadow_lut_max_radius else 0)
            kw["march_cell"] = max(1, int(8.0 // max(coarse, 1e-6)))
        for _ in range(n):
            self.state = sharded_render_step(
                self.grid, params, self.state, algorithm=self.algorithm,
                config=self.config, max_steps=steps, mesh=self.mesh,
                gather_samples=self.gather_samples, **kw,
            )
        return self.state

    def _moving(self, key, cached_key) -> bool:
        """Renderer's drag heuristic: a march-relevant key that changed
        since the last cached build AND since the previous step() call."""
        return (
            self.config.motion_mode == "coarse"
            and cached_key is not None
            and key != cached_key
            and key != getattr(self, "_last_step_key", None)
        )

    def step(self, n: int = 1) -> RenderState:
        if self.algorithm is Algorithm.PATH:
            lut_r = self._shadow_lut_radius()
            key = self._path_key(lut_r)
            moving = self._moving(key, self._path_view_key)
            self._last_step_key = key
            if moving:
                return self._motion_steps(n)
            cache_bytes = (
                self.config.width * self.config.height * self.max_steps * 5
            )
            if cache_bytes <= self.path_cache_budget_bytes:
                cache = self._current_path_view(lut_r)
                for _ in range(n):
                    self.state = sharded_path_step_cached(
                        self.grid, self.params, self.state, cache,
                        config=self.config, max_steps=self.max_steps,
                        mesh=self.mesh, shadow_lut_radius=lut_r,
                    )
            else:
                for _ in range(n):
                    self.state = sharded_render_step(
                        self.grid, self.params, self.state,
                        algorithm=self.algorithm, config=self.config,
                        max_steps=self.max_steps, mesh=self.mesh,
                        gather_samples=self.gather_samples,
                    )
            return self.state
        key = self._march_key()
        moving = self._moving(key, self._view_key)
        self._last_step_key = key
        if moving:
            return self._motion_steps(n)
        view = self._current_view()
        remaining = n
        while remaining > 0:
            k = self.frame_batch if remaining >= self.frame_batch else 1
            if self._use_compact:
                self.state = sharded_shade_compact_step(
                    self.grid, self.params, self.state, view,
                    algorithm=self.algorithm, config=self.config,
                    max_steps=self.max_steps, mesh=self.mesh, n_frames=k,
                )
            else:
                self.state = sharded_shade_step(
                    self.grid, self.params, self.state, view,
                    algorithm=self.algorithm, config=self.config,
                    max_steps=self.max_steps, mesh=self.mesh, n_frames=k,
                )
            remaining -= k
        return self.state
