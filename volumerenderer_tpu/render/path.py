"""PATH algorithm — per-pixel stochastic single-scattering path trace
(path_compute_color.comp).

Reference semantics: camera-ray fixed-step march; at each occupied voxel,
roll ``scatteringProbability``; on success redirect the ray (random
direction, origin reset, t=0 — path_compute_color.comp:96-104); every
occupied voxel adds in-scattering from the *single* configured light via
``computeLightContribution`` (:9-31).  Neither transmittance nor intensity
is ever attenuated in this shader (no ``T *=`` in its loop), so the walk
only ends when t exceeds the clipped tmax; the final color is
``clamp(finalColor)`` averaged by frameCount only (:119-125).

Fidelity note: the reference light term is literally
``(I0/10000) * exp(-val_fp * absorption * dt) ^ N`` where ``val_fp`` is the
density at ONE FIXED POINT one step from the light along
``normalize(light - sample)`` — the march position never advances with the
loop variable (path_compute_color.comp:20) and walks *away* from the sample.
``Fidelity.REFERENCE`` reproduces this exactly; ``Fidelity.CORRECTED``
marches the light->sample segment properly.

TPU-native structure: same two-level design as the photon walk — a bounded
``while_loop`` over scatter segments, each segment fully vectorized over a
pixel tile with a parallel first-scatter search on the counter-based RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.params import Fidelity, RenderParams, StaticConfig
from ..grid.dense import DenseGrid
from ..ops import camera, intersect, rng


def _light_term_reference(grid, sample_local, light_local, params):
    """Literal port of computeLightContribution (path_compute_color.comp:9-31)."""
    ray_local = light_local - sample_local
    length = jnp.linalg.norm(ray_local, axis=-1)
    ray_dir = ray_local / jnp.where(length[..., None] > 0, length[..., None], 1.0)
    n_steps = (length / params.ray_marching_step_size).astype(jnp.int32)
    probe = light_local + ray_dir * params.ray_marching_step_size
    val = grid.sample_nearest(probe)
    # N identical attenuations == exp(-val * abs * dt * N).
    return (params.photon_initial_intensity / 10000.0) * jnp.exp(
        -val
        * params.absorption_coefficient
        * params.ray_marching_step_size
        * n_steps.astype(jnp.float32)
    )


def _light_term_corrected(grid, sample_local, light_local, params, n_shadow: int):
    """Proper transmittance along the light->sample segment."""
    seg = sample_local - light_local
    length = jnp.linalg.norm(seg, axis=-1)
    direction = seg / jnp.where(length[..., None] > 0, length[..., None], 1.0)
    dt = params.ray_marching_step_size
    n_steps = (length / dt).astype(jnp.int32)
    s = jnp.arange(1, n_shadow + 1, dtype=jnp.float32)
    pts = light_local[..., None, :] + direction[..., None, :] * (
        s[:, None] * dt
    )
    vals = grid.sample_nearest(pts)
    mask = s[None, :] <= jnp.minimum(n_steps, n_shadow)[..., None]
    od = jnp.sum(jnp.where(mask, vals, 0.0), axis=-1) * (
        params.absorption_coefficient * dt
    )
    return (params.photon_initial_intensity / 10000.0) * jnp.exp(-od)


def render_frame(
    grid: DenseGrid,
    params: RenderParams,
    frame_count,
    config: StaticConfig,
    max_steps: int,
    row_start=0,
    num_rows: int | None = None,
) -> jax.Array:
    """One PATH frame. Returns (num_rows, W) scalar radiance in [0, 1]."""
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

    # Per-pixel RNG seed = uvec3(px, py, 0) * frameCount
    # (path_compute_color.comp:36-37; gid.x is the column, gid.y the global
    # image row — row_start keeps seeds shard-invariant).
    px = jnp.tile(jnp.arange(W, dtype=jnp.uint32), rows)
    py = jnp.repeat(
        jnp.asarray(row_start, jnp.uint32) + jnp.arange(rows, dtype=jnp.uint32), W
    )
    seeds = rng.make_seed(px, py, jnp.zeros_like(px), frame_count)

    light_local = grid.world_to_index(params.light_source_world_pos)

    n_rays = rows * W
    tile = min(config.ray_tile, n_rays)
    pad = (-n_rays) % tile
    o_i = jnp.pad(o_i, ((0, pad), (0, 0)))
    d_i = jnp.concatenate(
        [d_i, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))], axis=0
    )
    seeds = jnp.pad(seeds, ((0, pad), (0, 0)))
    n_tiles = (n_rays + pad) // tile

    step = params.ray_marching_step_size
    prob = params.scattering_probability
    S = max_steps
    ks = jnp.arange(S, dtype=jnp.float32)

    def trace_tile(inputs):
        o, d, seed0 = inputs
        n = o.shape[0]
        hit, tmin, tmax = intersect.intersect_aabb(
            o,
            d,
            grid.box_min_f,
            grid.box_max_f,
            jnp.zeros((n,)),
            jnp.full((n,), params.ray_max_distance),
        )
        # Entry-face disambiguation (see ops.march.ENTRY_EPS).
        from ..ops.march import ENTRY_EPS

        tmin = jnp.where(hit, tmin, 0.0) + ENTRY_EPS * step

        def segment(carry):
            seg_i, origin, direction, t0, seed_draws, color, alive = carry
            t = t0[:, None] + ks[None, :] * step
            pos = origin[:, None, :] + direction[:, None, :] * t[:, :, None]
            val = grid.sample_nearest(pos)
            occ = val > 0.0
            entered = alive[:, None] & (t < tmax[:, None])
            roll_site = occ & entered

            occ_rank = jnp.cumsum(roll_site.astype(jnp.uint32), axis=-1)
            roll = rng.randf_at(
                seed0[:, None, :], seed_draws[:, None] + occ_rank
            )
            scatter = roll_site & (roll < prob)
            any_scatter = jnp.any(scatter, axis=-1)
            k_star = jnp.argmax(scatter, axis=-1)
            pick = lambda a: jnp.take_along_axis(a, k_star[:, None], axis=-1)[:, 0]

            # Contributions: occupied voxels with no scatter strictly before
            # them (the scatter voxel itself still adds dC after the
            # redirect, path_compute_color.comp:106-110).
            before = jnp.cumsum(scatter.astype(jnp.int32), axis=-1) - scatter
            contrib_mask = roll_site & (before == 0)
            if config.fidelity is Fidelity.REFERENCE:
                light_in = _light_term_reference(grid, pos, light_local, params)
            else:
                light_in = _light_term_corrected(
                    grid, pos, light_local, params, n_shadow=S
                )
            d_c = jnp.where(contrib_mask, val * step * light_in, 0.0)
            color = color + jnp.sum(d_c, axis=-1)

            draws_in_seg = jnp.where(
                any_scatter,
                pick(occ_rank),
                occ_rank[:, -1],
            ).astype(jnp.uint32)

            nd1 = rng.randf_at(seed0, seed_draws + draws_in_seg + 1)
            nd2 = rng.randf_at(seed0, seed_draws + draws_in_seg + 2)
            new_dir = rng.random_dir(nd1, nd2)  # index space, as in reference
            scat_pos = jnp.take_along_axis(pos, k_star[:, None, None], axis=1)[
                :, 0, :
            ]

            return (
                seg_i + 1,
                jnp.where(any_scatter[:, None], scat_pos, origin),
                jnp.where(any_scatter[:, None], new_dir, direction),
                jnp.where(any_scatter, step, t0),
                seed_draws
                + draws_in_seg
                + jnp.where(any_scatter, jnp.uint32(2), jnp.uint32(0)),
                color,
                alive & any_scatter,
            )

        def cond(carry):
            seg_i, *_, alive = carry
            return jnp.any(alive) & (seg_i < config.max_path_segments)

        init = (
            jnp.zeros((), jnp.int32),
            o,
            d,
            tmin,
            jnp.zeros((n,), jnp.uint32),
            jnp.zeros((n,)),
            hit & (tmax > tmin),
        )
        final = jax.lax.while_loop(cond, segment, init)
        return final[5]

    colors = jax.lax.map(
        trace_tile,
        (
            o_i.reshape(n_tiles, tile, 3),
            d_i.reshape(n_tiles, tile, 3),
            seeds.reshape(n_tiles, tile, 3),
        ),
    ).reshape(-1)[:n_rays]
    return jnp.clip(colors, 0.0, 1.0).reshape(rows, W)
