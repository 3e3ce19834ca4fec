"""Color passes for the four many-light algorithms (Point/VPL, Sphere/VSL,
Ray/VRL, Beam/VBL).

Reference shape (point/sphere/ray/beam_compute_color.comp): per-pixel pinhole
ray, AABB clip, fixed-step front-to-back march accumulating
``T * val * dt * lightIncoming`` with ``T *= exp(-val * absorption * dt)``,
then ``frameColor = clamp(finalColor / lightCount)``.

TPU-native pipeline, split at the march/shade boundary:

  build_view (once per camera/volume/march-param change):
    1. ``ops.march``  — vectorized transmittance march -> per-sample gather
                        weights w_k (the only sequential physics, done as a
                        parallel cumprod), tiled over rays for memory.
    2. compaction     — ``top_k`` keeps the C highest-weight samples per
                        ray; exact whenever a ray has <= C samples with
                        nonzero weight (w is 0 outside the volume, in empty
                        voxels, and past the T<=0.001 cutoff, so the march
                        grid is overwhelmingly zeros).
    3. baking         — world-space sample coordinate planes, so per-frame
                        shading does zero volume fetches and zero index math.

  shade_view (every frame):
    4. light gather   — one batched (samples x lights) contraction through
                        the Pallas kernels (ops/gather.py dispatch); Ray and
                        Beam either expand their segments into flat
                        point/sphere lights (parity mode) or evaluate the
                        segment integral directly (analytic mode).
    5. reduce         — per-ray weighted sum, lightCount normalize, clamp.

All lights are white, so radiance is carried as a scalar per pixel and only
broadcast to RGB at the end (3x less HBM traffic than the reference's vec3).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct

from ..engine.params import Algorithm, RenderParams, StaticConfig
from ..grid.dense import DenseGrid
from ..ops import camera, gather as gather_ops, lights as lights_ops, march as march_ops
from .photon import LightArray


def required_march_steps(grid: DenseGrid, step_size: float, cap: int) -> int:
    """Static trip-count bound: nothing happens past the bbox diagonal.

    The AABB clip bounds active samples to the bbox crossing, whose length is
    at most the (padded) bbox diagonal; outside the bbox the density is 0 so
    no attenuation, contribution, or RNG draw occurs.  Truncating there is
    exact, and typically ~10-40x shorter than rayMaxDistance/step.
    """
    import math

    diag = math.sqrt(sum(float(s) ** 2 for s in grid.voxels.shape))
    return max(1, min(cap, int(math.ceil(diag / float(step_size))) + 2))


def _expanded_lights(lights: LightArray, params, algorithm, config):
    """Per-frame light preprocessing: flat (pos, intensity, valid) arrays.

    Ray/Beam segments are discretized and rank-compacted into a bounded
    buffer once per frame — legal because lights are frozen between the two
    passes (src/main.cpp:722-829).
    """
    if algorithm in (Algorithm.POINT,):
        return lights.pos_to, lights.intensity, lights.valid
    if algorithm in (Algorithm.SPHERE,):
        return lights.pos_from, lights.intensity, lights.valid
    pos, inten, valid = lights_ops.expand_segments(
        lights.pos_from,
        lights.pos_to,
        lights.intensity,
        lights.valid,
        params.light_ray_step_size,
        config.max_points_per_segment,
    )
    pos, inten, valid, _dropped = lights_ops.compact_valid(
        pos, inten, valid, config.expanded_light_capacity
    )
    return pos, inten, valid


@struct.dataclass
class CompactView:
    """Globally compacted baked march: ONLY the nonzero-weight samples.

    A ViewCache's (Np, C) planes are overwhelmingly zeros (rays that miss
    the volume, empty voxels, samples past the transmittance cutoff — e.g.
    ~19% nonzero at the 1080p bench config), and the gather kernels' whole-
    block skipping only removes blocks where ALL 65536 samples are zero.
    Compacting the nonzero samples into a dense prefix (order-preserving
    rank scatter, the same shape as ops.lights.compact_valid) makes every
    kernel block ~100% real work — ~3x fewer sample blocks for EVERY gather
    algorithm at identical semantics; per-ray radiance comes back via a
    sorted segment-sum over the baked ray ids (t-ascending within each ray,
    closer to the reference's own summation order than top-k order).
    """

    wx: jax.Array  # (Mc, 128) world-space sample x coords
    wy: jax.Array  # (Mc, 128)
    wz: jax.Array  # (Mc, 128)
    weight: jax.Array  # (Mc, 128) gather weights (zero = padding slot)
    ray_id: jax.Array  # (Mc, 128) i32 pixel index of each sample
    n_rays: int = struct.field(pytree_node=False)
    rows: int = struct.field(pytree_node=False)


def compact_view(view: ViewCache, capacity: int) -> CompactView:
    """Pack the nonzero-weight samples of ``view`` into ``capacity`` slots
    (multiple of 128).  Exact whenever capacity >= the nonzero count
    (engine.session auto-sizes it from the march probe); overflow would be
    dropped deterministically (trailing samples first)."""
    assert capacity % 128 == 0, capacity
    Np, C = view.weight.shape
    flat = lambda a: a.reshape(-1)
    mask = flat(view.weight) != 0.0
    rank = jnp.cumsum(mask.astype(jnp.int32))
    keep = mask & (rank <= capacity)
    dest = jnp.where(keep, rank - 1, capacity)  # capacity -> dropped

    def scatter(src, dtype=jnp.float32):
        return (
            jnp.zeros((capacity,), dtype).at[dest].set(flat(src), mode="drop")
        )

    ray = jnp.arange(Np * C, dtype=jnp.int32) // C
    # Padding slots keep ray_id = n_rays - 1 so the kept ids stay sorted
    # (their weight is 0, so they add nothing to that ray).
    ray_id = jnp.full((capacity,), view.n_rays - 1, jnp.int32).at[dest].set(
        ray, mode="drop"
    )
    shape = lambda a: a.reshape(capacity // 128, 128)
    return CompactView(
        wx=shape(scatter(view.wx)),
        wy=shape(scatter(view.wy)),
        wz=shape(scatter(view.wz)),
        weight=shape(scatter(view.weight)),
        ray_id=shape(ray_id),
        n_rays=view.n_rays,
        rows=view.rows,
    )


@struct.dataclass
class ViewCache:
    """Baked march for a fixed (camera, volume, step/absorption) view.

    While the camera and volume are static — the steady state of progressive
    accumulation — the reference re-runs an IDENTICAL per-pixel march every
    frame (only the lights change between frames).  On TPU the march's
    density fetches are gather-bound, so we memoize its entire output once:
    the top-C gather samples per ray as (step index, weight) pairs.  Each
    subsequent frame is pure MXU/VPU light-gather work with zero volume
    fetches.  Semantics are unchanged: rebuilding the cache reproduces the
    march bit-for-bit (engine.session tracks the dependency key).
    """

    wx: jax.Array  # (Np, C) world-space sample x coords
    wy: jax.Array  # (Np, C) world-space sample y coords
    wz: jax.Array  # (Np, C) world-space sample z coords
    weight: jax.Array  # (Np, C) gather weights T*val*dt
    n_rays: int = struct.field(pytree_node=False)  # un-padded ray count
    rows: int = struct.field(pytree_node=False)  # image rows covered


def build_view(
    grid: DenseGrid,
    params: RenderParams,
    config: StaticConfig,
    max_steps: int,
    gather_samples: int = 0,
    row_start=0,
    num_rows: int | None = None,
    clip_box=None,
) -> ViewCache:
    """Run the transmittance march for every pixel and bake the results.

    ``clip_box``: optional occupied-region corners (grid.dense.occupied_bbox)
    — lets max_steps be bounded by the occupied diagonal; bit-identical
    results (ops.march)."""
    H, W = config.height, config.width
    rows = H if num_rows is None else num_rows
    o_w, d_w = camera.camera_rays(
        W, H, params.fov, params.camera_pos,
        look_rotation=params.camera_rotation,
        row_start=row_start, num_rows=rows,
    )
    o_i = grid.world_to_index(o_w.reshape(-1, 3))
    d_i = grid.world_to_index_dir(d_w.reshape(-1, 3))
    d_i = d_i / jnp.linalg.norm(d_i, axis=-1, keepdims=True)

    n_rays = rows * W
    tile = min(config.ray_tile, n_rays)
    pad = (-n_rays) % tile
    o_i = jnp.pad(o_i, ((0, pad), (0, 0)))
    # Pad with unit +z rays; their results are sliced off by consumers.
    d_i = jnp.concatenate(
        [d_i, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))], axis=0
    )
    n_tiles = (n_rays + pad) // tile
    compact = bool(gather_samples) and gather_samples < max_steps
    C = gather_samples if compact else max_steps

    def march_tile(inputs):
        o, d = inputs
        m = march_ops.march(
            grid,
            o,
            d,
            ray_max_distance=params.ray_max_distance,
            step_size=params.ray_marching_step_size,
            absorption=params.absorption_coefficient,
            max_steps=max_steps,
            interpolation=config.interpolation,
            clip_box=clip_box,
        )
        if compact:
            w, idx = jax.lax.top_k(m.weight, C)
            t = m.tmin[:, None] + idx.astype(jnp.float32) * (
                params.ray_marching_step_size
            )
        else:
            w, t = m.weight, m.t
        # Bake world-space sample coordinates so per-frame shading touches
        # only (coords, weights) — no per-frame index math at all.
        ix = o[:, 0:1] + d[:, 0:1] * t
        iy = o[:, 1:2] + d[:, 1:2] * t
        iz = o[:, 2:3] + d[:, 2:3] * t
        mm = grid.map_mat
        mv = grid.map_vec
        wx = mm[0, 0] * ix + mm[0, 1] * iy + mm[0, 2] * iz + mv[0]
        wy = mm[1, 0] * ix + mm[1, 1] * iy + mm[1, 2] * iz + mv[1]
        wz = mm[2, 0] * ix + mm[2, 1] * iy + mm[2, 2] * iz + mv[2]
        return wx, wy, wz, w

    wx, wy, wz, w = jax.lax.map(
        march_tile,
        (o_i.reshape(n_tiles, tile, 3), d_i.reshape(n_tiles, tile, 3)),
    )
    Np = n_rays + pad
    reshape = lambda a: a.reshape(Np, C)
    wx, wy, wz, w = map(reshape, (wx, wy, wz, w))
    # The shade kernels want Np * C divisible by 128; pad rays with zero
    # weight (skipped blocks) to the next multiple of 128.
    pad2 = (-Np) % 128
    if pad2:
        pad_rows = lambda a: jnp.pad(a, ((0, pad2), (0, 0)))
        wx, wy, wz, w = map(pad_rows, (wx, wy, wz, w))
    return ViewCache(
        wx=wx, wy=wy, wz=wz, weight=w, n_rays=n_rays, rows=rows
    )


def shade_view(
    grid: DenseGrid,
    view: ViewCache,
    params: RenderParams,
    lights: LightArray,
    algorithm: Algorithm,
    config: StaticConfig,
    normalize: bool = True,
) -> jax.Array:
    """Shade a baked view with this frame's lights. Returns (rows, W) scalar
    radiance (white light).

    frameColor = clamp(finalColor / lightCount)
    (point_compute_color.comp:97); lightCount == 0 is divide-by-zero-
    undefined in GLSL, we define it as 0.  ``normalize=False`` returns raw
    radiance sums (used by light-axis sharding, which psums partials across
    chips before normalizing).
    """
    W = config.width
    if (
        algorithm in (Algorithm.RAY, Algorithm.BEAM)
        and config.segment_mode == "analytic"
    ):
        # Segment integral evaluated directly — no sub-light expansion
        # (ops.gather.gather_segments): closed form for Ray, fixed-node
        # quadrature for Beam's sphere lights.
        weighted = gather_ops.gather_segments(
            view.wx, view.wy, view.wz, view.weight,
            lights.pos_from, lights.pos_to, lights.intensity, lights.valid,
            impl=config.gather_impl,
            sphere_radius=(
                params.beam_radius if algorithm is Algorithm.BEAM else None
            ),
            quad_nodes=config.beam_quadrature_nodes,
        )
    elif (
        algorithm in (Algorithm.RAY, Algorithm.BEAM)
        and config.segment_mode == "discrete"
    ):
        # Reference-parity discrete sub-light sum, iterated in-kernel from
        # the raw segment table — uncapped, no HBM expansion
        # (ray_compute_color.comp:11-24 / beam_compute_color.comp:11-24).
        weighted = gather_ops.gather_segments_discrete(
            view.wx, view.wy, view.wz, view.weight,
            lights.pos_from, lights.pos_to, lights.intensity, lights.valid,
            params.light_ray_step_size,
            sphere_radius=(
                params.beam_radius if algorithm is Algorithm.BEAM else None
            ),
            impl=config.gather_impl,
            max_points_per_segment=config.max_points_per_segment,
        )
    else:
        l_pos, l_int, l_valid = _expanded_lights(
            lights, params, algorithm, config
        )
        # Volume-centered frame for the MXU distance matmul (gather_kernel).
        center = grid.index_to_world((grid.box_min_f + grid.box_max_f) * 0.5)
        sphere = algorithm in (Algorithm.SPHERE, Algorithm.BEAM)
        weighted = gather_ops.gather_planes(
            view.wx, view.wy, view.wz, view.weight, l_pos, l_int, l_valid,
            sphere=sphere, radius=params.beam_radius,
            impl=config.gather_impl, center=center,
        )
    colors = jnp.sum(weighted, axis=-1)[: view.n_rays]

    if not normalize:
        return colors.reshape(view.rows, W)
    denom = jnp.maximum(lights.count, 1).astype(jnp.float32)
    return jnp.clip(colors / denom, 0.0, 1.0).reshape(view.rows, W)


def render_frame(
    grid: DenseGrid,
    params: RenderParams,
    lights: LightArray,
    algorithm: Algorithm,
    config: StaticConfig,
    max_steps: int,
    gather_samples: int = 0,
    row_start=0,
    num_rows: int | None = None,
    normalize: bool = True,
) -> jax.Array:
    """One frame of the given gather algorithm (march + shade, uncached).

    Returns (num_rows, W) scalar radiance in [0, 1] (white light; broadcast
    to RGB by the accumulator).  ``gather_samples``: C for top-k compaction;
    0 gathers at every march sample (the bit-straightforward reference path,
    used by tests).  ``row_start``/``num_rows`` render a horizontal band of
    the full-image projection — the unit of multi-chip pixel sharding
    (parallel/sharding.py).  Interactive sessions reuse the march across
    frames instead via build_view/shade_view.
    """
    view = build_view(
        grid, params, config, max_steps, gather_samples, row_start, num_rows
    )
    return shade_view(
        grid, view, params, lights, algorithm, config, normalize=normalize
    )
