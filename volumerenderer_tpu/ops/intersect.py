"""Geometric intersectors — vectorized ports of common_functions.h.

All functions are branch-free (mask-returning) so they vectorize over ray
batches; semantics match the reference GLSL exactly, including IEEE inf
behavior of the slab test when a direction component is zero.
"""

from __future__ import annotations

import jax.numpy as jnp


def intersect_aabb(origin, direction, box_min, box_max, tmin, tmax):
    """Slab test (common_functions.h:27-40).

    origin/direction: (..., 3); box_min/box_max: broadcastable (..., 3);
    tmin/tmax: (...) initial interval (the shaders pass 0 / rayMaxDistance).
    Returns (hit, tmin, tmax) with the *clipped* interval; like the GLSL
    ``inout`` params, tmin/tmax are partially updated even on miss.
    """
    inv_d = 1.0 / direction  # +/-inf where direction == 0, as in GLSL
    t0 = (box_min - origin) * inv_d
    t1 = (box_max - origin) * inv_d
    swap = inv_d < 0.0
    lo = jnp.where(swap, t1, t0)
    hi = jnp.where(swap, t0, t1)
    # The GLSL loop exits at the first failing axis, leaving later axes
    # unapplied; since callers only use tmin/tmax when hit is True, a full
    # fold is equivalent.  NaNs (0 * inf when origin on a slab) propagate the
    # same "undefined" cases as the reference.
    tmin = jnp.maximum(tmin, jnp.max(lo, axis=-1))
    tmax = jnp.minimum(tmax, jnp.min(hi, axis=-1))
    hit = tmax >= tmin
    return hit, tmin, tmax


def intersect_sphere(origin, direction, center, radius):
    """Ray-sphere (common_functions.h:73-102). Returns (hit, t).

    ``direction`` is assumed normalized (as in the reference call sites).
    Picks the closest positive root; misses when both roots are behind.
    """
    oc = origin - center
    b = jnp.sum(oc * direction, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 0.0, t0, t1)
    hit = (disc >= 0.0) & (t > 0.0)
    return hit, jnp.where(hit, t, 0.0)


def intersect_thick_ray(cam_pos, cam_dir, line_origin, line_dir, width):
    """Segment-to-ray proximity test (common_functions.h:104-157).

    Returns (hit, t_hit) where t_hit is the camera-ray parameter of the
    closest approach; hit requires distance <= width and t, s >= 0.
    """
    cd = cam_dir / jnp.linalg.norm(cam_dir, axis=-1, keepdims=True)
    ld = line_dir / jnp.linalg.norm(line_dir, axis=-1, keepdims=True)
    w0 = cam_pos - line_origin
    a = jnp.sum(cd * cd, axis=-1)
    b = jnp.sum(cd * ld, axis=-1)
    c = jnp.sum(ld * ld, axis=-1)
    d = jnp.sum(cd * w0, axis=-1)
    e = jnp.sum(ld * w0, axis=-1)
    denom = a * c - b * b
    parallel = jnp.abs(denom) < 1e-6

    # Parallel branch: closest point of the line to the camera position.
    proj = line_origin + e[..., None] * ld
    dist2_par = jnp.sum((proj - cam_pos) ** 2, axis=-1)
    hit_par = dist2_par <= width * width

    inv = 1.0 / jnp.where(parallel, 1.0, denom)
    t = (b * e - c * d) * inv
    s = (a * e - b * d) * inv
    p_cam = cam_pos + cd * t[..., None]
    p_line = line_origin + ld * s[..., None]
    dist2 = jnp.sum((p_line - p_cam) ** 2, axis=-1)
    hit_gen = (dist2 <= width * width) & (t >= 0.0) & (s >= 0.0)

    hit = jnp.where(parallel, hit_par, hit_gen)
    t_hit = jnp.where(parallel, 0.0, t)
    return hit, jnp.where(hit, t_hit, 0.0)
