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
    t = tmin[..., None] + k * step_size  # (N, S)
    pos = origin_idx[..., None, :] + dir_idx[..., None, :] * t[..., None]
    if interpolation == "trilinear":
        val = grid.sample_trilinear(pos)
    else:
        val = grid.sample_nearest(pos)  # 0 outside bbox; no attenuation there

    atten = jnp.exp(-val * absorption * step_size)
    # Exclusive cumprod: T before sample k is the product of attenuations of
    # samples 0..k-1 (the shader attenuates *after* accumulating).
    trans = jnp.concatenate(
        [jnp.ones_like(atten[..., :1]), jnp.cumprod(atten[..., :-1], axis=-1)],
        axis=-1,
    )

    active = live[..., None] & (t < tmax[..., None]) & (trans > T_CUTOFF)
    weight = jnp.where(active, trans * val * step_size, 0.0)
    return MarchResult(t, tmin, tmax, val, trans, active, weight, hit)


def sample_positions(origin_idx, dir_idx, t):
    """Index-space sample positions for a MarchResult's t grid: (N, S, 3)."""
    return origin_idx[..., None, :] + dir_idx[..., None, :] * t[..., None]
