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

TPU-native structure (three levels, all exact):

  1. **Baked first segment** (``bake_path_view`` -> ``PathView``): the
     camera segment's march positions, densities, light terms, and the
     inclusive prefix of its in-scattering contributions depend only on
     (camera, volume, light, march params) — NOT on the frame counter —
     so they are baked once per view like the gather algorithms'
     ViewCache.  A cached frame's first segment is pure VPU work (RNG
     rolls + a prefix lookup): zero volume fetches.
  2. **Shadow-probe LUT**: the REFERENCE light term reads the density at
     ``light + dir*step`` — a point inside the closed ball of radius
     ``step`` around the light, so ``floor(probe)`` lies in the static
     ``(2R+1)^3`` voxel neighborhood with ``R = ceil(step)``.  Those few
     voxels are fetched once and the per-sample lookup becomes an
     arithmetic select-sum — replacing one random HBM gather per sample
     (half of the frame's gather traffic) with a handful of VPU ops.
     Bit-exact vs the gather (same floor, same voxel).
  3. **Compacted scatter segments**: after the camera segment only rays
     that scattered remain alive (alive(k+1) <= alive(k) structurally;
     measured decay ~0.6x/segment on cloud scenes), so each later
     segment compacts the alive indices (cumsum + scatter, order
     preserved) and walks them in a DYNAMIC number of fixed-width
     chunks (``while_loop`` + ``dynamic_slice``): gather volume tracks
     the true alive count within one chunk of padding, with a single
     compiled shape for any scene.  Exact — compaction only skips rows
     whose work is fully masked; per-row arithmetic is
     elementwise-identical to the full-width march.

Position math goes through ops.march.t_grid / ray_positions so the
rounding of ``o + d*t`` is pinned — the baked, inline, compacted, and
full-width paths all see bit-identical sample positions (a 1-ulp
difference would flip floor() at a voxel boundary and fork the walk).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..engine.params import Fidelity, RenderParams, StaticConfig
from ..grid.dense import DenseGrid, zrow_tile_cap as _zrow_tile_cap
from ..ops import camera, intersect, rng
from ..ops.march import ENTRY_EPS, ray_positions, t_grid
from ..ops.scan import cumsum_1d


class PathView(NamedTuple):
    """Frame-invariant planes of the camera segment (see module docstring).

    Arrays are padded to a whole number of ray tiles (``n_pad`` rows).
    The per-sample planes are RANK-INDEXED (round 5): the per-ray RNG
    draw index of a roll site IS its 1-based occupancy rank, and the
    rank is frame-invariant (it depends only on the baked roll-site
    pattern), so the bake sorts each ray's roll sites by rank once and
    stores, at column ``r``, the sample index (``rank_k``) and inclusive
    in-scattering prefix (``rank_prefix``) of the rank-``r+1`` site.
    The per-frame replay then needs NO per-site plane at all: it draws
    ``randf_at(seed, r)`` at the plain iota ranks (pure VPU — the first
    scattered rank is the MIN hit rank, by strict monotonicity of rank
    along the ray), and picks up the winner's ``(k, prefix)`` with one
    one-hot pass over the two rank planes.  Columns at or beyond
    ``n_occ`` (the per-ray roll-site total — the draw count of a
    no-scatter traversal) are unused; ``prefix_total`` is the full-ray
    prefix (the no-scatter color).
    """

    o_i: jax.Array  # (n_pad, 3) camera origins, index space
    d_i: jax.Array  # (n_pad, 3) unit directions, index space
    tmin: jax.Array  # (n_pad,) entry distance (ENTRY_EPS applied)
    tmax: jax.Array  # (n_pad,) clipped exit distance
    live: jax.Array  # (n_pad,) bool: ray marches at all
    rank_k: jax.Array  # (n_pad, S) uint16: sample index of rank r+1
    n_occ: jax.Array  # (n_pad,) uint16: total roll sites on the ray
    rank_prefix: jax.Array  # (n_pad, S) f32: prefix at rank r+1
    prefix_total: jax.Array  # (n_pad,) f32: full-ray prefix


# ---------------------------------------------------------------------------
# light terms


def _lut_offsets(radius: int) -> np.ndarray:
    L = 2 * radius + 1
    g = np.stack(
        np.meshgrid(*([np.arange(L, dtype=np.int32)] * 3), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    return g


def _shadow_lut(grid: DenseGrid, light_local, radius: int):
    """Densities of the (2R+1)^3 voxel neighborhood around the light.

    Valid replacement for ``sample_nearest(probe)`` whenever
    ``|probe - light| <= step <= R``: ``floor(light + u)`` for ``|u| <= R``
    lies within ``floor(light) +- ceil(R)`` componentwise.
    """
    base = jnp.floor(light_local).astype(jnp.int32) - radius
    offs = jnp.asarray(_lut_offsets(radius))
    vals = grid.sample_ijk(base[None, :] + offs)  # ((2R+1)^3,)
    return base, vals


def _lut_lookup(probe, base, vals, radius: int):
    """Select-sum lookup: exact sample_nearest(probe) via VPU compares."""
    L = 2 * radius + 1
    rel = jnp.floor(probe).astype(jnp.int32) - base
    lin = (rel[..., 0] * L + rel[..., 1]) * L + rel[..., 2]
    out = jnp.zeros(lin.shape, jnp.float32)
    for j in range(L * L * L):
        out = out + jnp.where(lin == j, vals[j], 0.0)
    return out


def _light_term_reference(grid, sample_local, light_local, params, lut=None,
                          light_step=None):
    """Literal port of computeLightContribution (path_compute_color.comp:9-31).

    ``lut``: optional (base, vals, radius) shadow LUT — bit-equal to the
    gather (requires radius >= ceil(step); the engine guarantees it).
    ``light_step``: the step size the LIGHT term derives its probe point
    and attenuation count from — defaults to the march step; the
    path_stride fast tier passes the ORIGINAL step here so the term (and
    the LUT validity ball) stay exact while the march coarsens.
    """
    step = (params.ray_marching_step_size if light_step is None
            else light_step)
    ray_local = light_local - sample_local
    length = jnp.linalg.norm(ray_local, axis=-1)
    ray_dir = ray_local / jnp.where(length[..., None] > 0, length[..., None], 1.0)
    n_steps = (length / step).astype(jnp.int32)
    probe = light_local + ray_dir * step
    if lut is None:
        val = grid.sample_nearest(probe)
    else:
        base, vals, radius = lut
        val = _lut_lookup(probe, base, vals, radius)
    # N identical attenuations == exp(-val * abs * dt * N).
    return (params.photon_initial_intensity / 10000.0) * jnp.exp(
        -val
        * params.absorption_coefficient
        * step
        * n_steps.astype(jnp.float32)
    )


def _light_term_reference_fast(grid, sample_local, light_local, params,
                               lut=None):
    """Divide/sqrt-free evaluation of the SAME reference light term —
    a PROBE kept for `scripts/bench_light_eval.py`, NOT wired to any
    config: measured perf-NEUTRAL at frame level (35.85 vs 35.90
    ms/frame at 256^2 on v5e), because with the shadow LUT active the
    light term's cost is the 27-way select, not the divides/sqrt this
    removes.  (The earlier `probe_walk_chunk_asset.py` "light=const
    saves 5.3 ms/chunk" delta was measured with ``lut=None`` — i.e. it
    was mostly the scattered probe FETCH the production LUT already
    eliminates, not arithmetic.)

    One ``rsqrt(|d|^2)`` yields both the unit direction (``d * inv``) and
    the length (``|d|^2 * inv``); the step count divides by a hoisted
    reciprocal; and when the shadow LUT applies, the 27-way select picks
    the precomputed exp argument ``val*absorption*step`` instead of the
    raw density.  Deviation from "exact" is rounding-level only
    (measured 1.1e-7 max relative, 79/4096 random sites differing at
    step 0.77): the probe point moves by ulps and ``n_steps`` can differ
    by 1 when ``length/step`` lands exactly on an integer.

    Boundary caveat (ADVICE r3): when ``step == lut radius`` exactly (the
    production pairing is step=1.0 -> radius 1), rsqrt rounding can put
    ``|probe - light|`` a few ulps OUTSIDE the LUT validity ball, and
    ``_lut_lookup`` would return density 0 instead of the true neighbor —
    a one-cell deviation, not rounding-level.  The probe offset is
    therefore renormalized below so ``|probe - light| <= step`` holds
    exactly under the LUT path.
    """
    ray_local = light_local - sample_local
    l2 = jnp.sum(ray_local * ray_local, axis=-1)
    inv = jax.lax.rsqrt(jnp.maximum(l2, 1e-30))
    length = l2 * inv
    step = params.ray_marching_step_size
    n_f = jnp.floor(length * (1.0 / step))
    # |ray_local * inv| can exceed 1 by ulps; one divide-free Newton
    # correction keeps |probe - light| <= step (the LUT validity ball).
    u2 = l2 * inv * inv
    scale = inv * step * jnp.where(u2 > 1.0, 2.0 - u2, 1.0)
    probe = light_local + ray_local * scale[..., None]
    a_scale = params.absorption_coefficient * step
    if lut is None:
        arg = grid.sample_nearest(probe) * a_scale
    else:
        base, vals, radius = lut
        arg = _lut_lookup(probe, base, vals * a_scale, radius)
    return (params.photon_initial_intensity / 10000.0) * jnp.exp(
        -arg * n_f
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


def _light_term(grid, pos, light_local, params, config, lut, n_shadow,
                light_step=None):
    if config.fidelity is Fidelity.REFERENCE:
        return _light_term_reference(grid, pos, light_local, params, lut,
                                     light_step=light_step)
    # CORRECTED marches the light segment at the same (possibly strided)
    # step as the camera march — a consistent coarsening.
    return _light_term_corrected(grid, pos, light_local, params, n_shadow)


# ---------------------------------------------------------------------------
# camera rays / seeds


def _camera_setup(grid, params, config, row_start, num_rows):
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
    return o_i, d_i, rows


def _seeds(W, rows, row_start, frame_count, n_pad):
    # Per-pixel RNG seed = uvec3(px, py, 0) * frameCount
    # (path_compute_color.comp:36-37; gid.x is the column, gid.y the global
    # image row — row_start keeps seeds shard-invariant).
    px = jnp.tile(jnp.arange(W, dtype=jnp.uint32), rows)
    py = jnp.repeat(
        jnp.asarray(row_start, jnp.uint32) + jnp.arange(rows, dtype=jnp.uint32), W
    )
    seeds = rng.make_seed(px, py, jnp.zeros_like(px), frame_count)
    return jnp.pad(seeds, ((0, n_pad - seeds.shape[0]), (0, 0)))


def _pad_rays(o_i, d_i, tile):
    n_rays = o_i.shape[0]
    pad = (-n_rays) % tile
    o_i = jnp.pad(o_i, ((0, pad), (0, 0)))
    d_i = jnp.concatenate(
        [d_i, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))], axis=0
    )
    return o_i, d_i, n_rays + pad


# ---------------------------------------------------------------------------
# segment 1: bake + consume


def _seg1_planes(grid, params, config, lut, S, o, d, light_step=None):
    """Frame-invariant planes for a tile of camera rays."""
    n = o.shape[0]
    step = params.ray_marching_step_size
    hit, tmin, tmax = intersect.intersect_aabb(
        o, d, grid.box_min_f, grid.box_max_f,
        jnp.zeros((n,)), jnp.full((n,), params.ray_max_distance),
    )
    # Entry-face disambiguation (ops.march.ENTRY_EPS).
    tmin = jnp.where(hit, tmin, 0.0) + ENTRY_EPS * step
    live = hit & (tmax > tmin)
    ks = jnp.arange(S, dtype=jnp.float32)
    t = t_grid(tmin, ks, step)
    pos = ray_positions(o, d, t)
    val = grid.sample_nearest(pos)
    light_local = grid.world_to_index(params.light_source_world_pos)
    roll_site = (val > 0.0) & live[:, None] & (t < tmax[:, None])
    light_in = _light_term(grid, pos, light_local, params, config, lut, S,
                           light_step=light_step)
    d_c = jnp.where(roll_site, val * step * light_in, 0.0)
    prefix = jnp.cumsum(d_c, axis=-1)
    # Bake the per-site RNG draw rank (frame-INVARIANT: it depends only
    # on the roll-site pattern) so the replay needs no per-frame scan.
    occ_rank = jnp.cumsum(roll_site.astype(jnp.uint32), axis=-1)
    site_rank = jnp.where(roll_site, occ_rank, 0).astype(jnp.uint16)
    n_occ = occ_rank[:, -1].astype(jnp.uint16)
    return tmin, tmax, live, site_rank, n_occ, prefix


def _seg1_planes_ranked(grid, params, config, lut, S, o, d, light_step=None):
    """_seg1_planes re-laid out by occupancy rank (see PathView).

    Column ``r`` of ``rank_k`` / ``rank_prefix`` holds the sample index
    and inclusive prefix of the rank-``r+1`` roll site (valid for
    ``r < n_occ``; the tail is sort filler, masked at use).  Built with a
    row sort on the (unique-per-row) rank keys — non-sites key to S+1 and
    land after every real site."""
    tmin, tmax, live, site_rank, n_occ, prefix = _seg1_planes(
        grid, params, config, lut, S, o, d, light_step=light_step
    )
    key = jnp.where(site_rank > 0, site_rank.astype(jnp.int32), S + 1)
    ks = jax.lax.broadcasted_iota(jnp.int32, site_rank.shape, 1)
    _skey, sk, sprefix = jax.lax.sort(
        (key, ks, prefix), dimension=-1, num_keys=1
    )
    return (tmin, tmax, live, sk.astype(jnp.uint16), n_occ, sprefix,
            prefix[:, -1])


def _seg1_frame(params, S, o, d, tmin, tmax, live, site_rank, n_occ,
                prefix, seed0):
    """Per-frame camera segment from baked planes: RNG + prefix lookup only.

    Returns (color, origin2, dir2, seed_draws2, alive2) — the walk state
    entering segment 2.  Matches the full march bit-for-bit: the scatter
    site is the first roll site whose draw (at its occupancy rank) is
    below the scattering probability, the color is the contribution
    prefix at that site (or the full prefix when no scatter), and the
    re-origin position is o + d*t(k*) with pinned rounding.

    Scan-free (round 5): the baked ``site_rank`` IS the per-site draw
    index, and it increases strictly along the ray, so the FIRST scatter
    site is the scattered site of MINIMUM rank — a reduce, not a cumsum —
    and every per-site quantity the frame needs (roll value, one-hot of
    the winner, prefix/draw pickup) is elementwise against that reduced
    rank.  No per-frame (n, S) scan, no per-ray row gathers; bit-exact
    vs the round-4 cumsum form (same ranks, same draws, same winner).
    """
    step = params.ray_marching_step_size
    prob = params.scattering_probability
    sr = site_rank.astype(jnp.uint32)
    is_site = sr > 0
    roll = rng.randf_at(seed0[:, None, :], sr)
    scatter = is_site & (roll < prob)
    BIG = jnp.uint32(0xFFFFFFFF)
    r_min = jnp.min(jnp.where(scatter, sr, BIG), axis=-1)
    any_sc = r_min != BIG
    first = scatter & (sr == r_min[:, None])
    S_ = site_rank.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, S_), 1)
    k_star = jnp.sum(jnp.where(first, iota, 0), axis=-1)
    color = jnp.where(
        any_sc, jnp.sum(jnp.where(first, prefix, 0.0), axis=-1),
        prefix[:, -1],
    )
    draws = jnp.where(any_sc, r_min, n_occ.astype(jnp.uint32))
    nd1 = rng.randf_at(seed0, draws + 1)
    nd2 = rng.randf_at(seed0, draws + 2)
    new_dir = rng.random_dir(nd1, nd2)  # index space, as in reference
    t_sc = t_grid(tmin, k_star.astype(jnp.float32)[:, None], step)  # (n, 1)
    scat_pos = ray_positions(o, d, t_sc)[:, 0, :]
    origin2 = jnp.where(any_sc[:, None], scat_pos, o)
    dir2 = jnp.where(any_sc[:, None], new_dir, d)
    seed_draws2 = draws + jnp.where(any_sc, jnp.uint32(2), jnp.uint32(0))
    alive2 = live & any_sc
    return color, origin2, dir2, seed_draws2, alive2


def _seg1_frame_rank(params, S, o, d, tmin, n_occ, rank_k, rank_prefix,
                     prefix_total, seed0):
    """Cached camera-segment replay over RANK-indexed planes (PathView).

    Bit-identical to ``_seg1_frame`` on the same scene: the draw at rank
    ``r`` is ``randf_at(seed0, r)`` either way, the first scattered site
    is the one of minimum hit rank (rank increases strictly along the
    ray), and column ``r-1`` of the rank planes holds exactly the
    winner's sample index and prefix.  The win is structural: pass 1
    (the RNG sweep + min-reduce) reads NO per-site plane — rolls are a
    pure function of (seed, iota rank) — and pass 2 is one one-hot
    sweep over the two rank planes.  Rays that never scatter (min hit
    rank > ``n_occ``, which is 0 for dead/padding rows) take the baked
    ``prefix_total`` and keep their camera ray, as before.
    """
    step = params.ray_marching_step_size
    prob = params.scattering_probability
    ranks = jax.lax.broadcasted_iota(jnp.uint32, (1, S), 1) + jnp.uint32(1)
    roll = rng.randf_at(seed0[:, None, :], ranks)
    hit = roll < prob
    BIG = jnp.uint32(0xFFFFFFFF)
    r_min = jnp.min(jnp.where(hit, ranks, BIG), axis=-1)
    n_occ32 = n_occ.astype(jnp.uint32)
    any_sc = r_min <= n_occ32
    onehot = ranks == r_min[:, None]
    color = jnp.where(
        any_sc,
        jnp.sum(jnp.where(onehot, rank_prefix, 0.0), axis=-1),
        prefix_total,
    )
    k_star = jnp.sum(
        jnp.where(onehot, rank_k.astype(jnp.int32), 0), axis=-1
    )
    draws = jnp.where(any_sc, r_min, n_occ32)
    nd1 = rng.randf_at(seed0, draws + 1)
    nd2 = rng.randf_at(seed0, draws + 2)
    new_dir = rng.random_dir(nd1, nd2)
    t_sc = t_grid(tmin, k_star.astype(jnp.float32)[:, None], step)  # (n, 1)
    scat_pos = ray_positions(o, d, t_sc)[:, 0, :]
    origin2 = jnp.where(any_sc[:, None], scat_pos, o)
    dir2 = jnp.where(any_sc[:, None], new_dir, d)
    seed_draws2 = draws + jnp.where(any_sc, jnp.uint32(2), jnp.uint32(0))
    return color, origin2, dir2, seed_draws2, any_sc


# ---------------------------------------------------------------------------
# scatter segments (2..max_path_segments)


def _walk_chunk(grid, params, config, lut, S, light_local,
                o, d, seed0, seed_draws, tmax, alive, march_cell=1,
                light_step=None):
    """One scatter segment for a chunk of rays: t0 = step (the reference
    resets currentT on scatter), march to the per-ray original tmax.
    Returns (d_color, origin', dir', seed_draws', alive').

    The sample axis runs in SUB-BLOCKS under a ``while_loop`` that stops
    as soon as every ray in the chunk is resolved — scattered, past its
    own box exit (density is exactly 0 beyond, so no further roll site
    can exist), or past tmax.  Typical segments resolve in 2-4 blocks of
    the worst-case S/32, cutting the chunk's gather volume accordingly;
    results are exact (skipped blocks are provably all-masked).

    ``march_cell > 1`` additionally compacts the sample axis to OCCUPIED
    coarse cells first (the camera march's dilated-brick superset,
    ops.march._select_cells): scatter rays only fetch/roll at samples
    whose ``march_cell``-sample cell touches an occupied brick.  Exact —
    skipped cells have exactly-zero density, so they host no roll sites,
    consume no RNG draws, and add no contribution; the caller guarantees
    ``march_cell * step <= one 8-voxel brick pitch`` (engine.session
    derives the cell exactly as for the camera view build)."""
    from ..ops.march import _select_cells

    step = params.ray_marching_step_size
    prob = params.scattering_probability
    n = o.shape[0]
    SB = min(max(8, config.path_subblock), S)
    t0 = jnp.full((n,), 1.0, jnp.float32) * step
    # Per-row stop distance: box exit from the segment origin (origins are
    # scatter sites inside the volume; a straight ray never re-enters a
    # convex box), clamped by the original-ray tmax the loop tests.
    _h, _e0, seg_exit = intersect.intersect_aabb(
        o, d, grid.box_min_f, grid.box_max_f,
        jnp.zeros((n,)), jnp.full((n,), params.ray_max_distance),
    )
    stop_t = jnp.minimum(tmax, seg_exit)

    C = march_cell
    if C > 1:
        # Occupied-cell compaction: selected cells, in ascending-t order
        # (top_k over descending keys), per-ray selected count.
        sel_c, n_cells = _select_cells(
            grid, o, d, t0, stop_t, alive,
            step_size=step, max_steps=S, cell=C,
        )
        ci = jnp.arange(n_cells, dtype=jnp.int32)
        key = jnp.where(sel_c, n_cells - ci, 0)
        kv, idx_c = jax.lax.top_k(key, n_cells)
        cell_ok = kv > 0
        ncell_sel = jnp.sum(sel_c.astype(jnp.int32), axis=-1)
        CB = max(1, SB // C)
        n_sb = -(-n_cells // CB)
        pad = n_sb * CB - n_cells
        if pad:
            # Pad to a CB multiple so the block slice never clamps (a
            # clamped slice would re-walk tail cells: double contribution
            # + double RNG-rank count).  Padding rows are ok=False.
            idx_c = jnp.pad(idx_c, ((0, 0), (0, pad)))
            cell_ok = jnp.pad(cell_ok, ((0, 0), (0, pad)))
    else:
        n_sb = -(-S // SB)

    def block(carry):
        j, found, color, rank_base, scat_t, draws_sc, _all_done = carry
        if C > 1:
            cells_j = jax.lax.dynamic_slice_in_dim(idx_c, j * CB, CB, axis=1)
            ok_j = jax.lax.dynamic_slice_in_dim(cell_ok, j * CB, CB, axis=1)
            jj = jnp.arange(C, dtype=jnp.int32)
            kf = (cells_j[:, :, None] * C + jj).reshape(n, CB * C)
            valid = jnp.repeat(ok_j, C, axis=-1) & (kf < S)
            t = t_grid(t0, kf.astype(jnp.float32), step)
        else:
            ks = (j * SB + jnp.arange(SB)).astype(jnp.float32)
            valid = None
            t = t_grid(t0, ks, step)
        pos = ray_positions(o, d, t)
        val = grid.sample_nearest(pos)
        if valid is not None:
            val = jnp.where(valid, val, 0.0)
        roll_site = (val > 0.0) & alive[:, None] & (t < tmax[:, None])
        rank = rank_base[:, None] + jnp.cumsum(
            roll_site.astype(jnp.uint32), axis=-1
        )
        roll = rng.randf_at(seed0[:, None, :], seed_draws[:, None] + rank)
        scatter = roll_site & (roll < prob) & ~found[:, None]
        newly = jnp.any(scatter, axis=-1)
        # Contributions: occupied sites with no scatter strictly before
        # them (the scatter site itself still adds dC after the redirect,
        # path_compute_color.comp:106-110).
        before = jnp.cumsum(scatter.astype(jnp.int32), axis=-1) - scatter
        contrib = roll_site & (before == 0) & ~found[:, None]
        light_in = _light_term(grid, pos, light_local, params, config, lut, S,
                               light_step=light_step)
        color = color + jnp.sum(
            jnp.where(contrib, val * step * light_in, 0.0), axis=-1
        )
        # One-hot select of the first scatter site (before == 0 picks it)
        # instead of argmax + take_along_axis row gathers — same
        # fetch-wall reasoning as _seg1_frame, bit-identical.
        first_sc = scatter & (before == 0)
        scat_t = jnp.where(
            newly, jnp.sum(jnp.where(first_sc, t, 0.0), axis=-1), scat_t)
        draws_sc = jnp.where(
            newly,
            jnp.sum(jnp.where(first_sc, rank, jnp.uint32(0)), axis=-1),
            draws_sc,
        )
        found = found | newly
        rank_base = rank[:, -1]
        if C > 1:
            # A ray past its last selected cell sees only exact-zero
            # density — no further roll site, draw, or contribution.
            done = ~alive | found | ((j + 1) * CB >= ncell_sel)
        else:
            done = ~alive | found | (t[:, -1] >= stop_t)
        return (j + 1, found, color, rank_base, scat_t, draws_sc,
                jnp.all(done))

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.uint32),
        jnp.full((n,), 1.0, jnp.float32) * step,
        jnp.zeros((n,), jnp.uint32),
        jnp.zeros((), bool),
    )
    _, found, d_color, rank_total, scat_t, draws_sc, _ = jax.lax.while_loop(
        lambda c: (c[0] < n_sb) & ~c[6], block, init
    )
    any_sc = found
    draws = jnp.where(any_sc, draws_sc, rank_total)
    nd1 = rng.randf_at(seed0, seed_draws + draws + 1)
    nd2 = rng.randf_at(seed0, seed_draws + draws + 2)
    new_dir = rng.random_dir(nd1, nd2)
    scat_pos = ray_positions(o, d, scat_t[:, None])[:, 0, :]
    return (
        d_color,
        jnp.where(any_sc[:, None], scat_pos, o),
        jnp.where(any_sc[:, None], new_dir, d),
        seed_draws + draws + jnp.where(any_sc, jnp.uint32(2), jnp.uint32(0)),
        alive & any_sc,
    )


def _chunk_for(n: int, tile: int) -> int:
    """Largest chunk <= tile dividing n (caps are multiples of 1024, so
    the halving search terminates at or above 1024)."""
    c = min(tile, n)
    while n % c:
        c //= 2
    return c


def _cached_tile_target(config, S: int) -> int:
    """Ray-tile target for the fetch-free cached replay.

    Explicit path_cached_tile is used DIRECTLY so the knob tunes in
    BOTH directions (ADVICE r4).  0 (default) auto-sizes: the largest
    power-of-two tile whose (tile, S) f32 temporary stays under
    ~256 MB, clamped to [16384, 524288] — in-program loop overhead is
    ~0.38 ms/tile (probe_path_replay.py round 5), so fewer, wider
    dispatches win until the working set grows past cache-friendly
    sizes."""
    if config.path_cached_tile > 0:
        return config.path_cached_tile
    cap = (256 << 20) // max(S * 4, 1)
    tile = 16384
    while tile * 2 <= min(cap, 524288):
        tile *= 2
    return tile


def _walk_segment(grid, params, config, lut, S, light_local,
                  o, d, seed0, seed_draws, tmax, alive, march_cell=1,
                  light_step=None):
    """_walk_chunk tiled over ray chunks (bounds the (chunk, S) gather
    temporaries; n is a multiple of the chunk size by construction)."""
    n = o.shape[0]
    chunk = _chunk_for(n, config.ray_tile)
    if n == chunk:
        return _walk_chunk(grid, params, config, lut, S, light_local,
                           o, d, seed0, seed_draws, tmax, alive,
                           march_cell=march_cell, light_step=light_step)
    m = n // chunk
    r3 = lambda a: a.reshape(m, chunk, 3)
    r1 = lambda a: a.reshape(m, chunk)
    out = jax.lax.map(
        lambda args: _walk_chunk(grid, params, config, lut, S, light_local,
                                 *args, march_cell=march_cell,
                                 light_step=light_step),
        (r3(o), r3(d), r3(seed0), r1(seed_draws), r1(tmax), r1(alive)),
    )
    dc, o2, d2, sd2, al2 = out
    return (dc.reshape(n), o2.reshape(n, 3), d2.reshape(n, 3),
            sd2.reshape(n), al2.reshape(n))


def _chunk_cost_key(grid, params, config, S, o, d, tmax, alive,
                    march_cell=1, key_mode="cells"):
    """Per-ray upper bound on the _walk_chunk block trip count.

    The chunk ``while_loop`` runs to the SLOWEST ray in the chunk
    (measured at asset scale: per-ray blocks mean ~1.5, chunk max ~11),
    so grouping the compacted alive list by this key makes the sum of
    chunk maxima approach the ideal (fully sorted) total.  Purely a
    scheduling key: per-ray walk arithmetic is independent of chunk
    grouping (masked rows fetch zero, draw no RNG, add nothing), so ANY
    key keeps results bit-identical.  Two forms, picked by cost:

      * cell-count — ceil(selected occupied cells / cell block), the
        while_loop's actual trip count, ONLY when the dilated-brick
        table fits the arithmetic packed select (grid.dense
        _OCC_SELECT_MAX_TERMS): then it costs pure VPU work.  On bigger
        tables _select_cells falls back to scattered jnp.take and a
        full-width key would pay n_pad * n_cells gathers per segment
        (measured at asset scale: +940 ms/frame, wiping out the win).
      * span — ceil(remaining in-box distance / sub-block span), box
        exits only (always-cheap arithmetic): a correlation proxy for
        the trip count (empty space along the span is invisible to it).

    ``key_mode`` ("cells"/"span", resolved from StaticConfig.path_sort_key
    by _sorted_compact) picks between them; "cells" still falls back to
    span when the packed select doesn't apply.  Dead rays key to
    INT32_MAX, placing them after every alive ray."""
    from ..grid.dense import _OCC_SELECT_MAX_TERMS
    from ..ops.march import _select_cells

    step = params.ray_marching_step_size
    n = o.shape[0]
    SB = min(max(8, config.path_subblock), S)
    t0 = jnp.full((n,), 1.0, jnp.float32) * step
    _h, _e, seg_exit = intersect.intersect_aabb(
        o, d, grid.box_min_f, grid.box_max_f,
        jnp.zeros((n,)), jnp.full((n,), params.ray_max_distance),
    )
    stop_t = jnp.minimum(tmax, seg_exit)
    X, Y, Z = grid.brick_occ_dil.shape
    packed_select = X * Y * (-(-Z // 32)) <= _OCC_SELECT_MAX_TERMS
    C = march_cell
    if C > 1 and packed_select and key_mode == "cells":
        sel_c, _ = _select_cells(
            grid, o, d, t0, stop_t, alive,
            step_size=step, max_steps=S, cell=C,
        )
        ncell = jnp.sum(sel_c.astype(jnp.int32), axis=-1)
        CB = max(1, SB // C)
        blocks = (ncell + CB - 1) // CB
    else:
        span = jnp.maximum(stop_t - t0, 0.0)
        blocks = jnp.ceil(span / (step * jnp.float32(SB))).astype(jnp.int32)
    return jnp.where(alive, blocks, jnp.iinfo(jnp.int32).max)


# "auto" path_sort_key crossover, in PER-FRAME rays: "cells" measured
# faster up to 512^2 (262144 rays), "span" at 1080p (2.07M) on v5e —
# a dedicated constant, decoupled from path_compact_min (which tests
# lower for unrelated coverage reasons; ADVICE r4).
_PATH_SORT_CELLS_MAX_RAYS = 262144


def _sorted_compact(grid, params, config, S, o, d, tmax, alive,
                    march_cell=1, n_frames=1):
    """Alive-ray compaction ordered by _chunk_cost_key (ascending): the
    first ``count`` slots are the alive rays, cheapest chunks first.
    Tiled over probe_tile so the cell-endpoint temporaries stay small.
    ``n_frames``: render_frames concatenates F frames' states, so the
    auto key normalizes by per-frame ray count (batching must not flip
    the choice — the measured crossover is an image-size property)."""
    n = o.shape[0]
    key_mode = config.path_sort_key
    if key_mode == "auto":
        key_mode = (
            "cells"
            if n // max(n_frames, 1) <= _PATH_SORT_CELLS_MAX_RAYS
            else "span"
        )
    tile = _chunk_for(n, config.probe_tile)
    if tile == n:
        key = _chunk_cost_key(grid, params, config, S, o, d, tmax, alive,
                              march_cell=march_cell, key_mode=key_mode)
    else:
        m = n // tile
        key = jax.lax.map(
            lambda args: _chunk_cost_key(grid, params, config, S, *args,
                                         march_cell=march_cell,
                                         key_mode=key_mode),
            (o.reshape(m, tile, 3), d.reshape(m, tile, 3),
             tmax.reshape(m, tile), alive.reshape(m, tile)),
        ).reshape(n)
    return jnp.argsort(key)


def _compact_indices(alive, cap):
    """Indices of the first ``cap`` alive rows (in order) + validity mask.

    Built with a cumsum + scatter (no sort): row i with alive rank r < cap
    lands at slot r.  Exact when the alive count fits the cap — the caller
    guards that with a lax.cond."""
    n = alive.shape[0]
    pos = cumsum_1d(alive.astype(jnp.int32)) - 1
    tgt = jnp.where(alive & (pos < cap), pos, cap)
    idx = (
        jnp.zeros((cap + 1,), jnp.int32)
        .at[tgt]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
    )
    count = jnp.sum(alive.astype(jnp.int32))
    valid = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(count, cap)
    return idx, valid


def _scatter_segments(grid, params, config, lut, S, light_local,
                      seed0, state, march_cell=1, n_frames=1,
                      light_step=None, seed_spec=None):
    """Unrolled segments 2..max_path_segments, each marching only the
    alive rays (module docstring, level 3): compact the alive indices
    (cumsum + scatter, order-preserving), then a ``while_loop`` walks a
    DYNAMIC number of fixed-width chunks of the compacted list — one
    compiled gather shape regardless of the alive count, adaptive to any
    scene, and exact (no ray is ever dropped; padding rows are masked).

    ``seed_spec`` = (width, rows, row_start, frame_counts): lets the
    compacted path re-derive per-ray RNG seeds from the original row
    index instead of carrying three seed columns through every chunk
    gather (see the pack layout comment below).

    Tiny images (n_pad <= path_compact_min) skip the compaction plumbing
    and march full-width."""
    color, o, d, seed_draws, tmax, alive = state
    n_pad = o.shape[0]

    if n_pad <= config.path_compact_min:
        for _k in range(2, config.max_path_segments + 1):
            count = jnp.sum(alive.astype(jnp.int32))

            def full_pass(args):
                color, o, d, seed_draws, alive = args
                dc, o2, d2, sd2, al2 = _walk_segment(
                    grid, params, config, lut, S, light_local,
                    o, d, seed0, seed_draws, tmax, alive,
                    march_cell=march_cell, light_step=light_step,
                )
                return (color + dc, o2, d2, sd2, al2)

            color, o, d, seed_draws, alive = jax.lax.cond(
                count > 0, full_pass, lambda a: a,
                (color, o, d, seed_draws, alive),
            )
        return color

    W = _chunk_for(n_pad, max(32, config.path_chunk))
    lanes = jnp.arange(W, dtype=jnp.int32)

    # Per-chunk state moves through ONE packed (n_pad, 9) f32 array —
    # columns [o(3), d(3), bitcast(seed_draws), tmax,
    # bitcast(orig_signed)] where orig_signed is the ray's ORIGINAL
    # row index, negated to -1 for resolved rays (alive == orig >= 0).
    # Round-5 restructure, two parts:
    #   1. Walked rows are written CONTIGUOUSLY into the next segment's
    #      buffer (chunk j lands at rows [j*W, (j+1)*W) — a
    #      dynamic_update_slice, free) instead of scattered back to
    #      their original rows, so the state stays in compacted order
    #      across segments and the only per-row scatter left is a
    #      1-wide color add at the original index.  The 13-wide row
    #      scatter-back cost ~97 ns/row on top of the ~71 ns/row gather
    #      (sweep_walk_1080p.py — the fetch wall charges per ELEMENT on
    #      narrow rows; widths >= 100 lose more at frame level than
    #      their faster row rate buys).
    #   2. The RNG seed columns are GONE: PATH's per-pixel seed is
    #      uvec3(px, py, 0) * frameCount (path_compute_color.comp:37),
    #      a two-multiply function of the original index and the frame
    #      counter, so each chunk re-derives its seeds from orig_signed
    #      (seed_spec carries width/rows/row_start/frame_counts) —
    #      3 fewer gathered columns on every chunk-row, for ~30 VPU ops
    #      per row.
    # Bit-exact: bitcasts round-trip u32/i32 exactly; seeds re-derive
    # to the identical uint32 triple (frame-batch indices resolve by
    # arithmetic one-hot over the frame axis); chunk membership and row
    # order are scheduling only (masked rows fetch zero, draw no RNG,
    # add nothing), and each alive ray appears in exactly one chunk per
    # segment, so the per-ray color accumulation order is unchanged
    # (seg1 + seg2 + ... in sequence).
    _f32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    _u32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)
    _i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    # Rows padded to path_pack_width (a measurement knob; the 9 payload
    # columns measured best — see StaticConfig.path_pack_width).
    PW = max(9, config.path_pack_width)

    def _pad_cols(a):
        return jnp.pad(a, ((0, 0), (0, PW - 9))) if PW > 9 else a

    W_img, rows_img, row_start, frame_counts = seed_spec
    n_rays_img = rows_img * W_img
    n_pad_frame = n_pad // max(n_frames, 1)
    F = frame_counts.shape[0]
    DEAD = jnp.float32(jax.lax.bitcast_convert_type(
        jnp.int32(-1), jnp.float32))

    def _chunk_seeds(og):
        """The _seeds() triple for original rows ``og`` (i32; < 0 dead).

        Identical u32 values: px*fc, py*fc, 0 for image rays; 0 for the
        bake's padding rows (and for dead rows, whose frame one-hot
        misses every index)."""
        ol = og % n_pad_frame
        f = og // n_pad_frame
        fc = jnp.zeros(og.shape, jnp.uint32)
        for j in range(F):
            fc = fc + jnp.where(
                f == j, frame_counts[j].astype(jnp.uint32), jnp.uint32(0)
            )
        in_img = ol < n_rays_img
        px = (ol % W_img).astype(jnp.uint32)
        py = (jnp.asarray(row_start, jnp.int32) + ol // W_img).astype(
            jnp.uint32)
        zero = jnp.zeros(og.shape, jnp.uint32)
        return jnp.stack(
            [jnp.where(in_img, px * fc, 0), jnp.where(in_img, py * fc, 0),
             zero], axis=-1,
        )

    orig0 = jnp.arange(n_pad, dtype=jnp.int32)
    A = _pad_cols(jnp.concatenate(
        [o, d, _f32(seed_draws)[:, None], tmax[:, None],
         _f32(jnp.where(alive, orig0, -1))[:, None]], axis=1,
    ))

    for _k in range(2, config.max_path_segments + 1):
        # The whole segment — compaction, sort key, chunk walk — sits
        # under a count>0 cond: once every ray is resolved the remaining
        # segments cost one reduction each (measured 59 ms/segment of
        # pure full-width sort/compact overhead at 1080p otherwise).
        count = jnp.sum((_i32(A[:, 8]) >= 0).astype(jnp.int32))

        def segment_pass(args):
            A, color = args
            o_c, d_c = A[:, 0:3], A[:, 3:6]
            tmax_c = A[:, 7]
            alive_c = _i32(A[:, 8]) >= 0
            if config.path_sort_chunks and not (
                config.path_sort_once and _k > 2
            ):
                idx = _sorted_compact(grid, params, config, S, o_c, d_c,
                                      tmax_c, alive_c,
                                      march_cell=march_cell,
                                      n_frames=n_frames)
            else:
                idx, _valid = _compact_indices(alive_c, n_pad)
            n_chunks = (count + W - 1) // W

            def body(carry):
                j, A_next, color = carry
                idc = jax.lax.dynamic_slice_in_dim(idx, j * W, W)
                row_valid = (j * W + lanes) < count
                st = jnp.take(A, idc, axis=0, mode="clip")
                orig = _i32(st[:, 8])
                dc, o2, d2, sd2, al2 = _walk_chunk(
                    grid, params, config, lut, S, light_local,
                    st[:, 0:3], st[:, 3:6], _chunk_seeds(orig),
                    _u32(st[:, 6]), st[:, 7],
                    (orig >= 0) & row_valid,
                    march_cell=march_cell, light_step=light_step,
                )
                st2 = _pad_cols(jnp.concatenate(
                    [o2, d2, _f32(sd2)[:, None], st[:, 7:8],
                     _f32(jnp.where(al2, orig, -1))[:, None]],
                    axis=1,
                ))
                A_next = jax.lax.dynamic_update_slice(A_next, st2, (j * W, 0))
                # 1-wide color add at the baked original index; padding
                # rows route out of bounds and drop.
                tgt = jnp.where(row_valid, orig, n_pad)
                color = color.at[tgt].add(
                    jnp.where(row_valid, dc, 0.0), mode="drop"
                )
                return j + 1, A_next, color

            # Rows never written by a chunk must read DEAD (orig -1).
            A_init = jnp.zeros_like(A).at[:, 8].set(DEAD)
            _, A_next, color = jax.lax.while_loop(
                lambda c: c[0] < n_chunks, body,
                (jnp.zeros((), jnp.int32), A_init, color),
            )
            return A_next, color

        A, color = jax.lax.cond(
            count > 0, segment_pass, lambda a: a, (A, color)
        )
    return color


# ---------------------------------------------------------------------------
# public API


def bake_path_view(
    grid: DenseGrid,
    params: RenderParams,
    config: StaticConfig,
    max_steps: int,
    row_start=0,
    num_rows: int | None = None,
    shadow_lut_radius: int = 0,
    light_step=None,
) -> PathView:
    """Bake the frame-invariant camera-segment planes (see PathView).

    Rebuild whenever camera/volume/march/light parameters change (the
    engine keys this); the scattering probability and frame counter are
    per-frame inputs and are NOT baked.  ``light_step``: original step
    for the light term under the path_stride fast tier (see
    _light_term_reference).
    """
    S = max_steps
    o_i, d_i, rows = _camera_setup(grid, params, config, row_start, num_rows)
    # _seg1_planes fetches the volume at S samples/ray: deep-z volumes
    # must budget the z-row gather table (grid.dense.zrow_tile_cap).
    tile = _zrow_tile_cap(grid, S, min(config.ray_tile, rows * config.width))
    o_i, d_i, n_pad = _pad_rays(o_i, d_i, tile)
    lut = _make_lut(grid, params, config, shadow_lut_radius)
    m = n_pad // tile
    tmin, tmax, live, rank_k, n_occ, rank_prefix, prefix_total = jax.lax.map(
        lambda args: _seg1_planes_ranked(grid, params, config, lut, S, *args,
                                         light_step=light_step),
        (o_i.reshape(m, tile, 3), d_i.reshape(m, tile, 3)),
    )
    view = PathView(
        o_i=o_i,
        d_i=d_i,
        tmin=tmin.reshape(n_pad),
        tmax=tmax.reshape(n_pad),
        live=live.reshape(n_pad),
        rank_k=rank_k.reshape(n_pad, S),
        n_occ=n_occ.reshape(n_pad),
        rank_prefix=rank_prefix.reshape(n_pad, S),
        prefix_total=prefix_total.reshape(n_pad),
    )
    # Pad the view to a multiple of the cached-replay tile target: the
    # bake tile is z-row-budgeted (16384 at 1080p -> n_pad = 127 x 16384,
    # 127 PRIME), so without this _chunk_for collapses the cached tile
    # back to the bake tile and the fetch-free replay pays one dispatch
    # round-trip per 16384 rays (127 sequential dispatches/frame measured
    # as the bulk of the 468 ms replay floor).  Padding rows are
    # live=False: no roll sites, zero prefix, never alive after seg1 —
    # bit-identical frames (only op shapes change).  <= one tile of extra
    # rows (~0.8% at 1080p); images at or under the target already run
    # one dispatch and skip this.
    target = _cached_tile_target(config, S)
    if n_pad > target and n_pad % target:
        extra = target - n_pad % target
        pad1 = lambda a: jnp.pad(a, (0, extra))
        pad2 = lambda a: jnp.pad(a, ((0, extra), (0, 0)))
        view = PathView(
            o_i=pad2(view.o_i),
            d_i=jnp.concatenate(
                [view.d_i,
                 jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (extra, 3))],
                axis=0,
            ),
            tmin=pad1(view.tmin),
            tmax=pad1(view.tmax),
            live=pad1(view.live),
            rank_k=pad2(view.rank_k),
            n_occ=pad1(view.n_occ),
            rank_prefix=pad2(view.rank_prefix),
            prefix_total=pad1(view.prefix_total),
        )
    return view


def _make_lut(grid, params, config, shadow_lut_radius):
    if shadow_lut_radius <= 0 or config.fidelity is not Fidelity.REFERENCE:
        return None
    light_local = grid.world_to_index(params.light_source_world_pos)
    base, vals = _shadow_lut(grid, light_local, shadow_lut_radius)
    return (base, vals, shadow_lut_radius)


def render_frame(
    grid: DenseGrid,
    params: RenderParams,
    frame_count,
    config: StaticConfig,
    max_steps: int,
    row_start=0,
    num_rows: int | None = None,
    shadow_lut_radius: int = 0,
    cache: PathView | None = None,
    march_cell: int = 1,
    light_step=None,
) -> jax.Array:
    """One PATH frame. Returns (num_rows, W) scalar radiance in [0, 1].

    ``shadow_lut_radius``: enable the exact shadow-probe LUT (must satisfy
    radius >= ceil(step); 0 disables — the engine passes ceil(step) when
    it fits ``config.shadow_lut_max_radius``).  ``cache``: a PathView from
    ``bake_path_view`` (same row window) — skips the camera-segment march
    entirely; semantics identical.
    """
    H, W = config.height, config.width
    rows = H if num_rows is None else num_rows
    n_rays = rows * W
    S = max_steps
    lut = _make_lut(grid, params, config, shadow_lut_radius)
    light_local = grid.world_to_index(params.light_source_world_pos)

    if cache is None:
        o_i, d_i, rows = _camera_setup(grid, params, config, row_start, num_rows)
        # tile_seg1 marches the volume at S samples/ray (z-row budget).
        tile = _zrow_tile_cap(grid, S, min(config.ray_tile, n_rays))
        o_i, d_i, n_pad = _pad_rays(o_i, d_i, tile)
        seeds = _seeds(W, rows, row_start, frame_count, n_pad)
        m = n_pad // tile

        def tile_seg1(args):
            o, d, s0 = args
            tmin, tmax, live, site_rank, n_occ, prefix = _seg1_planes(
                grid, params, config, lut, S, o, d, light_step=light_step
            )
            out = _seg1_frame(params, S, o, d, tmin, tmax, live,
                              site_rank, n_occ, prefix, s0)
            return (*out, tmax)

        color, o2, d2, sd2, al2, tmax = jax.lax.map(
            tile_seg1,
            (o_i.reshape(m, tile, 3), d_i.reshape(m, tile, 3),
             seeds.reshape(m, tile, 3)),
        )
        color = color.reshape(n_pad)
        state = (color, o2.reshape(n_pad, 3), d2.reshape(n_pad, 3),
                 sd2.reshape(n_pad), tmax.reshape(n_pad), al2.reshape(n_pad))
    else:
        n_pad = cache.o_i.shape[0]
        # Cached seg1 is fetch-free VPU replay: wide tiles, few dispatches
        # (StaticConfig.path_cached_tile; the bake pads n_pad to a
        # multiple of the target so the wide tile materializes).
        tile = _chunk_for(n_pad, _cached_tile_target(config, S))
        seeds = _seeds(W, rows, row_start, frame_count, n_pad)
        m = n_pad // tile
        r3 = lambda a: a.reshape(m, tile, 3)
        r1 = lambda a: a.reshape(m, tile)
        r2 = lambda a: a.reshape(m, tile, S)
        color, o2, d2, sd2, al2 = jax.lax.map(
            lambda args: _seg1_frame_rank(params, S, *args),
            (r3(cache.o_i), r3(cache.d_i), r1(cache.tmin), r1(cache.n_occ),
             r2(cache.rank_k), r2(cache.rank_prefix),
             r1(cache.prefix_total), r3(seeds)),
        )
        state = (color.reshape(n_pad), o2.reshape(n_pad, 3),
                 d2.reshape(n_pad, 3), sd2.reshape(n_pad), cache.tmax,
                 al2.reshape(n_pad))

    if config.max_path_segments > 1:
        color = _scatter_segments(
            grid, params, config, lut, S, light_local, seeds, state,
            march_cell=march_cell, light_step=light_step,
            seed_spec=(W, rows, row_start,
                       jnp.asarray(frame_count, jnp.uint32).reshape(1)),
        )
    else:
        color = state[0]
    # The reference's walk condition `photonIntensity > 0.01`
    # (path_compute_color.comp:86) is CONSTANT per frame — PATH never
    # attenuates photonIntensity — so intensity <= 0.01 means the loop
    # never runs and the frame is black.  Gate the whole frame identically.
    live_frame = (params.photon_initial_intensity > 0.01).astype(jnp.float32)
    return (live_frame * jnp.clip(color[:n_rays], 0.0, 1.0)).reshape(rows, W)


def render_frames(
    grid: DenseGrid,
    params: RenderParams,
    frame_counts,
    config: StaticConfig,
    max_steps: int,
    cache: PathView,
    row_start=0,
    num_rows: int | None = None,
    shadow_lut_radius: int = 0,
    march_cell: int = 1,
    light_step=None,
) -> jax.Array:
    """``len(frame_counts)`` cached PATH frames in ONE program, with the
    scatter segments batched ACROSS frames.  Returns (F, rows, W).

    At small images PATH is dominated by per-op fixed overhead: a 256^2
    frame's scatter chunks are (2048, 32)-shaped ops whose dispatch cost
    exceeds their arithmetic (measured ~4.2 ms per segment regardless of
    the alive count).  Frames are fully independent — each consumes its
    own per-ray seed streams — so their scatter states CONCATENATE: one
    compaction + one chunk walk over all frames' alive rays makes every
    op F times larger for the same total work.  Per-frame results are
    IDENTICAL to ``render_frame`` called per frame (same seeds, same
    walk, same clamp); only op shapes change.  The chunk width scales by
    F so the fixed-cost amortization actually materializes."""
    H, W = config.height, config.width
    rows = H if num_rows is None else num_rows
    n_rays = rows * W
    S = max_steps
    F = frame_counts.shape[0]
    lut = _make_lut(grid, params, config, shadow_lut_radius)
    light_local = grid.world_to_index(params.light_source_world_pos)

    n_pad = cache.o_i.shape[0]
    # Wide fetch-free replay tiles, as in render_frame's cached branch.
    tile = _chunk_for(n_pad, _cached_tile_target(config, S))
    m = n_pad // tile
    r3 = lambda a: a.reshape(m, tile, 3)
    r1 = lambda a: a.reshape(m, tile)
    r2 = lambda a: a.reshape(m, tile, S)

    def frame_seg1(fc):
        seeds = _seeds(W, rows, row_start, fc, n_pad)
        color, o2, d2, sd2, al2 = jax.lax.map(
            lambda args: _seg1_frame_rank(params, S, *args),
            (r3(cache.o_i), r3(cache.d_i), r1(cache.tmin), r1(cache.n_occ),
             r2(cache.rank_k), r2(cache.rank_prefix),
             r1(cache.prefix_total), r3(seeds)),
        )
        return (color.reshape(n_pad), o2.reshape(n_pad, 3),
                d2.reshape(n_pad, 3), sd2.reshape(n_pad),
                al2.reshape(n_pad), seeds)

    color, o2, d2, sd2, al2, seeds = jax.lax.map(frame_seg1, frame_counts)

    flat = lambda a: a.reshape((F * n_pad,) + a.shape[2:])
    tmaxF = jnp.broadcast_to(cache.tmax, (F, n_pad))
    state = (flat(color), flat(o2), flat(d2), flat(sd2), flat(tmaxF),
             flat(al2))

    if config.max_path_segments > 1:
        import dataclasses

        cfgF = dataclasses.replace(config, path_chunk=config.path_chunk * F)
        colorF = _scatter_segments(
            grid, params, cfgF, lut, S, light_local, flat(seeds), state,
            march_cell=march_cell, n_frames=F, light_step=light_step,
            seed_spec=(W, rows, row_start,
                       jnp.asarray(frame_counts, jnp.uint32)),
        )
    else:
        colorF = state[0]
    out = colorF.reshape(F, n_pad)[:, :n_rays]
    # Same constant walk gate as render_frame (path_compute_color.comp:86).
    live_frame = (params.photon_initial_intensity > 0.01).astype(jnp.float32)
    return (live_frame * jnp.clip(out, 0.0, 1.0)).reshape(F, rows, W)
