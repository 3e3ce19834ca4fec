"""Transmittance ray-march — the shared skeleton of all five color passes.

The reference marches each pixel in a divergent GLSL while-loop
(point_compute_color.comp:68-94 and identical twins).  On TPU the march is
re-shaped into fixed-trip-count, fully-vectorized form:

  1. AABB-clip every ray (tmin..tmax), giving a static step grid
     ``t_k = tmin + k * step`` with an execution mask.
  2. One vectorized density fetch per (ray, step) — a single big gather.
  3. Transmittance via an exclusive cumulative product over the step axis
     (the sequential ``T *= exp(-val*abs*dt)`` becomes a parallel scan).
  4. Per-sample *gather weights* ``w_k = T_k * val_k * dt`` so the expensive
     many-light gather can run as one batched contraction afterwards,
     decoupled from the (cheap) sequential transmittance recursion.

Loop-exit parity: the GLSL loop tests ``t < tmax && T > 0.001`` *before* each
sample and adds dC with the pre-attenuation T, so the mask uses the exclusive
cumulative transmittance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..grid.dense import DenseGrid
from . import intersect

T_CUTOFF = 0.001  # point_compute_color.comp:68

# The first sample sits exactly on the bbox entry face (t == tmin from the
# slab test), where floor() is ambiguous at f32: XLA's FMA contraction of
# o + d*t can land on either side of the voxel boundary depending on how the
# expression compiles (the reference GPU has the identical ambiguity).  We
# define the semantics by nudging the entry sample inside the box by
# ENTRY_EPS * step — visually nil, but deterministic across eager/compiled/
# TPU/CPU.  Documented deviation from the (ambiguous) reference.
ENTRY_EPS = 1e-3


def t_grid(tmin, k, step_size):
    """March distances tmin + k*step with PINNED rounding (see
    ray_positions): the product k*step rounds separately in every program,
    so compacted/plain marches and probes see bit-identical t values."""
    return tmin[..., None] + jax.lax.optimization_barrier(k * step_size)


def ray_positions(origin_idx, dir_idx, t):
    """Sample positions o + d*t with PINNED rounding: the product d*t is
    forced to round separately (optimization_barrier) so every program —
    plain march, compacted march, probes, density harness — computes the
    bit-identical position.  Without it XLA may FMA-contract o + d*t
    differently per surrounding fusion, and a 1-ulp position difference
    flips floor() at voxel boundaries (the ENTRY_EPS note's ambiguity,
    mid-ray)."""
    prod = jax.lax.optimization_barrier(
        dir_idx[..., None, :] * t[..., None]
    )
    return origin_idx[..., None, :] + prod


class MarchResult(NamedTuple):
    t: jax.Array  # (N, S) march distances along each ray (index space)
    tmin: jax.Array  # (N,)
    tmax: jax.Array  # (N,) clipped exit distance
    val: jax.Array  # (N, S) density at each sample (0 outside bbox)
    trans: jax.Array  # (N, S) transmittance *before* sample k
    active: jax.Array  # (N, S) bool: loop would execute step k
    weight: jax.Array  # (N, S) = trans * val * dt * active
    hit: jax.Array  # (N,) ray intersected the volume bbox


def march(
    grid: DenseGrid,
    origin_idx: jax.Array,
    dir_idx: jax.Array,
    *,
    ray_max_distance,
    step_size,
    absorption,
    max_steps: int,
    interpolation: str = "nearest",
    clip_box=None,
    occupied_cap: int | None = None,
    cell: int = 8,
) -> MarchResult:
    """March rays given in *index space* (origins (N,3), unit dirs (N,3)).

    ``max_steps`` is the static trip-count bound; steps past a ray's tmax or
    transmittance cutoff are masked out, matching the reference's early exit.
    ``interpolation``: "nearest" reproduces the reference's voxel fetch
    (pnanovdb_readaccessor_get_value_address); "trilinear" is the smoother
    extension (8-tap).

    ``clip_box``: optional (lo, hi) index-space corners of the OCCUPIED
    region (grid.dense.occupied_bbox).  The sample grid is advanced past the
    leading vacuum by a WHOLE number of steps, so sample phases — and
    therefore results — are bit-identical to the unclipped march, while
    ``max_steps`` may be bounded by the occupied diagonal instead of the
    full volume's.
    """
    zero = jnp.zeros(origin_idx.shape[:-1], jnp.float32)
    hit, tmin, tmax = intersect.intersect_aabb(
        origin_idx,
        dir_idx,
        grid.box_min_f,
        grid.box_max_f,
        zero,
        zero + ray_max_distance,
    )
    live = hit & (tmax > 0.0)
    tmin = jnp.maximum(tmin, 0.0) + ENTRY_EPS * step_size

    if clip_box is not None:
        lo, hi = clip_box
        hit2, u_lo, u_hi = intersect.intersect_aabb(
            origin_idx,
            dir_idx,
            jnp.asarray(lo, jnp.float32),
            jnp.asarray(hi, jnp.float32),
            zero,
            zero + ray_max_distance,
        )
        live = live & hit2 & (u_hi > 0.0)
        # Skip leading vacuum by whole steps (floor: one conservative sample
        # before the occupied box; skipped samples are exactly zero density
        # so transmittance is unchanged).
        m = jnp.floor(jnp.maximum(u_lo - tmin, 0.0) / step_size)
        tmin = tmin + m * step_size
        tmax = jnp.minimum(tmax, u_hi + step_size)

    k = jnp.arange(max_steps, dtype=jnp.float32)
    t = t_grid(tmin, k, step_size)  # (N, S)
    if occupied_cap is not None and interpolation == "nearest" and cell > 1:
        # Brick-level empty-space skipping via COARSE cells: the fine step
        # grid is grouped into cells of `cell` samples (engine.session
        # sizes `cell` so cell*step <= one 8^3 brick pitch).  The 1-brick-
        # DILATED occupancy table is tested only at cell endpoints — a
        # guaranteed superset of the bricks any fine sample in the cell
        # touches (a straight <=8-voxel segment spans <=2 brick coords per
        # axis, so every point's brick is within 1 of an endpoint's) — and
        # the first `occupied_cap/cell` selected cells per ray expand back
        # to fine samples, where the expensive HBM volume is fetched.
        # Skipped samples have exactly-zero density (attenuation factor
        # exactly 1.0), so the compacted march has the exact same nonzero
        # support and factor multiset; values match the full march to ~1
        # ulp (the cumprod prefix tree associates differently over the
        # shorter axis).  Exact support whenever occupied_cap >= cell *
        # the per-ray selected-cell maximum (occupancy_counts measures the
        # same selection); the reference analogue is the (unused) HDDA
        # machinery at PNanoVDB_GLSL.h:2651+ and leaf masks at :1312-1317.
        sel_c, n_cells = _select_cells(
            grid, origin_idx, dir_idx, tmin, tmax, live,
            step_size=step_size, max_steps=max_steps, cell=cell,
        )
        ci = jnp.arange(n_cells, dtype=jnp.int32)
        key = jnp.where(sel_c, n_cells - ci, 0)
        kc = max(1, -(-min(occupied_cap, max_steps) // cell))
        kv, idx_c = jax.lax.top_k(key, min(kc, n_cells))
        cell_ok = kv > 0
        j = jnp.arange(cell, dtype=jnp.int32)
        kf = (idx_c[..., :, None] * cell + j).reshape(*idx_c.shape[:-1], -1)
        sel = (
            jnp.repeat(cell_ok, cell, axis=-1) & (kf < max_steps)
        )
        t = t_grid(tmin, kf.astype(jnp.float32), step_size)
        pos_sel = ray_positions(origin_idx, dir_idx, t)
        val = jnp.where(sel, grid.sample_nearest(pos_sel), 0.0)
    else:
        sel = None
        pos = ray_positions(origin_idx, dir_idx, t)
        if interpolation == "trilinear":
            val = grid.sample_trilinear(pos)
        else:
            val = grid.sample_nearest(pos)  # 0 outside bbox; no atten there

    atten = jnp.exp(-val * absorption * step_size)
    # Exclusive cumprod: T before sample k is the product of attenuations of
    # samples 0..k-1 (the shader attenuates *after* accumulating).
    trans = jnp.concatenate(
        [jnp.ones_like(atten[..., :1]), jnp.cumprod(atten[..., :-1], axis=-1)],
        axis=-1,
    )

    active = live[..., None] & (t < tmax[..., None]) & (trans > T_CUTOFF)
    if sel is not None:
        active = active & sel
    weight = jnp.where(active, trans * val * step_size, 0.0)
    return MarchResult(t, tmin, tmax, val, trans, active, weight, hit)


def sample_positions(origin_idx, dir_idx, t):
    """Index-space sample positions for a MarchResult's t grid: (N, S, 3)."""
    return ray_positions(origin_idx, dir_idx, t)


def _select_cells(grid, origin_idx, dir_idx, tmin, tmax, live, *,
                  step_size, max_steps: int, cell: int):
    """Coarse-cell selection mask (N, n_cells): dilated brick occupancy
    tested at cell endpoints, OR of both (superset of any fine sample's
    brick), masked to live rays and cells starting before tmax."""
    n_cells = -(-max_steps // cell)
    c = jnp.arange(n_cells + 1, dtype=jnp.float32)
    t_c = t_grid(tmin, c * cell, step_size)  # (N, n_cells+1)
    pos_c = ray_positions(origin_idx, dir_idx, t_c)
    occ_d = grid.brick_occupancy_dilated_at(pos_c)
    sel = (occ_d[..., :-1] | occ_d[..., 1:])
    sel = sel & live[..., None] & (t_c[..., :-1] < tmax[..., None])
    return sel, n_cells


def occupancy_counts(
    grid: DenseGrid,
    origin_idx,
    dir_idx,
    *,
    ray_max_distance,
    step_size,
    max_steps: int,
    clip_box=None,
    cell: int = 8,
):
    """Per-ray fine-sample budget of the coarse-cell selection (selected
    cells x cell) — no volume fetches, only the tiny dilated brick table
    at 1/cell the sample rate.  The exact bound for ``march(...,
    occupied_cap=...)``: a cap >= max(counts) makes the compacted march
    reproduce the full march's nonzero support exactly (values to ~1 ulp,
    see march)."""
    zero = jnp.zeros(origin_idx.shape[:-1], jnp.float32)
    hit, tmin, tmax = intersect.intersect_aabb(
        origin_idx, dir_idx, grid.box_min_f, grid.box_max_f,
        zero, zero + ray_max_distance,
    )
    live = hit & (tmax > 0.0)
    tmin = jnp.maximum(tmin, 0.0) + ENTRY_EPS * step_size
    if clip_box is not None:
        lo, hi = clip_box
        hit2, u_lo, u_hi = intersect.intersect_aabb(
            origin_idx, dir_idx,
            jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
            zero, zero + ray_max_distance,
        )
        live = live & hit2 & (u_hi > 0.0)
        m = jnp.floor(jnp.maximum(u_lo - tmin, 0.0) / step_size)
        tmin = tmin + m * step_size
        tmax = jnp.minimum(tmax, u_hi + step_size)
    sel, _ = _select_cells(
        grid, origin_idx, dir_idx, tmin, tmax, live,
        step_size=step_size, max_steps=max_steps, cell=cell,
    )
    return jnp.sum(sel.astype(jnp.int32), axis=-1) * cell
