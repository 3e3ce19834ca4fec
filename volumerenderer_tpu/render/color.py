"""Color passes for the four many-light algorithms (Point/VPL, Sphere/VSL,
Ray/VRL, Beam/VBL).

Reference shape (point/sphere/ray/beam_compute_color.comp): per-pixel pinhole
ray, AABB clip, fixed-step front-to-back march accumulating
``T * val * dt * lightIncoming`` with ``T *= exp(-val * absorption * dt)``,
then ``frameColor = clamp(finalColor / lightCount)``.

TPU-native pipeline (per ray tile):

  1. ``ops.march``      — vectorized transmittance march -> per-sample gather
                          weights w_k (the only sequential physics, done as a
                          parallel cumprod).
  2. compaction         — ``top_k`` keeps the C highest-weight samples per
                          ray; exact whenever a ray has <= C samples with
                          nonzero weight (w is 0 outside the volume, in empty
                          voxels, and past the T<=0.001 cutoff, so the march
                          grid is overwhelmingly zeros).
  3. light gather       — one batched (samples x lights) contraction; Ray and
                          Beam first expand their segment lights into flat
                          point/sphere lights once per frame
                          (ops.lights.expand_segments), collapsing the
                          reference's O(lights x segmentSteps) nested loop
                          into the same dense gather as Point/Sphere.

All lights are white, so radiance is carried as a scalar per pixel and only
broadcast to RGB at the end (3x less HBM traffic than the reference's vec3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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


def _gather(sample_pos, l_pos, l_int, l_valid, params, algorithm, config, center):
    sphere = algorithm in (Algorithm.SPHERE, Algorithm.BEAM)
    return gather_ops.gather(
        sample_pos,
        l_pos,
        l_int,
        l_valid,
        sphere=sphere,
        radius=params.beam_radius,
        impl=config.gather_impl,
        center=center,
    )


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
    """One frame of the given gather algorithm. Returns (num_rows, W) scalar
    radiance in [0, 1] (white light; broadcast to RGB by the accumulator).

    ``gather_samples``: C for top-k compaction; 0 gathers at every march
    sample (the bit-straightforward reference path, used by tests).
    ``row_start``/``num_rows`` render a horizontal band of the full-image
    projection — the unit of multi-chip pixel sharding (parallel/sharding.py).
    """
    H, W = config.height, config.width
    rows = H if num_rows is None else num_rows
    o_w, d_w = camera.camera_rays(
        W, H, params.fov, params.camera_pos, row_start=row_start, num_rows=rows
    )
    o_i = grid.world_to_index(o_w.reshape(-1, 3))
    d_i = grid.world_to_index_dir(d_w.reshape(-1, 3))
    d_i = d_i / jnp.linalg.norm(d_i, axis=-1, keepdims=True)

    l_pos, l_int, l_valid = _expanded_lights(lights, params, algorithm, config)
    # Volume-centered frame for the MXU distance matmul (see gather_kernel).
    center = grid.index_to_world((grid.box_min_f + grid.box_max_f) * 0.5)

    n_rays = rows * W
    tile = min(config.ray_tile, n_rays)
    pad = (-n_rays) % tile
    o_i = jnp.pad(o_i, ((0, pad), (0, 0)))
    # Pad with unit +z rays; their results are sliced off below.
    d_i = jnp.concatenate(
        [d_i, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))], axis=0
    )
    n_tiles = (n_rays + pad) // tile

    def render_tile(inputs):
        o, d = inputs
        m = march_ops.march(
            grid,
            o,
            d,
            ray_max_distance=params.ray_max_distance,
            step_size=params.ray_marching_step_size,
            absorption=params.absorption_coefficient,
            max_steps=max_steps,
        )
        if gather_samples and gather_samples < max_steps:
            w, idx = jax.lax.top_k(m.weight, gather_samples)
            t = jnp.take_along_axis(m.t, idx, axis=-1)
        else:
            w, t = m.weight, m.t
        pos_idx = o[:, None, :] + d[:, None, :] * t[..., None]
        pos_world = grid.index_to_world(pos_idx)
        flat = pos_world.reshape(-1, 3)
        light_in = _gather(
            flat, l_pos, l_int, l_valid, params, algorithm, config, center
        )
        light_in = light_in.reshape(w.shape)
        return jnp.sum(w * light_in, axis=-1)

    colors = jax.lax.map(
        render_tile,
        (o_i.reshape(n_tiles, tile, 3), d_i.reshape(n_tiles, tile, 3)),
    ).reshape(-1)[:n_rays]

    # frameColor = clamp(finalColor / lightCount) (point_compute_color.comp:97).
    # lightCount == 0 is divide-by-zero-undefined in GLSL; we define it as 0.
    # normalize=False returns the raw radiance sums (used by light-axis
    # sharding, which psums partials across chips before normalizing).
    if not normalize:
        return colors.reshape(rows, W)
    denom = jnp.maximum(lights.count, 1).astype(jnp.float32)
    return jnp.clip(colors / denom, 0.0, 1.0).reshape(rows, W)
