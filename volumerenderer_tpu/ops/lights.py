"""Virtual-light contribution models and segment expansion.

Parity targets:
  * point light:  I / (4 pi d^2), white, with d^2 < 1e-4 -> 0 guard
    (common_functions.h:186-194)
  * sphere light: point-light eval at the closest point of a beam_radius
    sphere toward the sample (common_functions.h:182-201) — algebraically
    I / (4 pi (|p - c| - r)^2) with the same guard.
  * segment lights (Ray/VRL, Beam/VBL): a RayLight segment from->to is
    discretized every ``light_ray_step_size`` into floor(len/step) points of
    intensity I/steps (ray_compute_color.comp:11-24,
    beam_compute_color.comp:11-24).

``expand_segments`` materializes the segment discretization once per frame
into a flat point/sphere-light array — legal because lights are frozen
between the light-gen and color passes (src/main.cpp:722-829) — turning the
Ray/Beam double loop into the same dense gather as Point/Sphere, which is the
shape TPUs want (one big batched contraction instead of nested dynamic loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scan import cumsum_1d

GUARD = 1e-4  # d^2 guard from common_functions.h:190
FOUR_PI = 4.0 * 3.14159265358979323846


def point_light_scalar(sample_pos, light_pos, intensity):
    """Scalar (white) point-light contribution; shapes broadcast."""
    d2 = jnp.sum((light_pos - sample_pos) ** 2, axis=-1)
    atten = intensity / (FOUR_PI * d2)
    return jnp.where(d2 < GUARD, 0.0, atten)


def sphere_light_scalar(sample_pos, center, intensity, beam_radius):
    """Sphere-light: point light at the closest sphere point toward sample."""
    diff = sample_pos - center
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    d = dist - beam_radius  # signed; squared below matches |.|
    d2 = d * d
    atten = intensity / (FOUR_PI * d2)
    # When sample == center the reference normalizes a zero vector (GLSL
    # undefined); we define it as no contribution.
    return jnp.where((d2 < GUARD) | (dist == 0.0), 0.0, atten)


def segment_point_count(pos_from, pos_to, light_ray_step_size):
    """floor(|to - from| / step) as int32 (ray_compute_color.comp:15)."""
    length = jnp.linalg.norm(pos_to - pos_from, axis=-1)
    return (length / light_ray_step_size).astype(jnp.int32)


def expand_segments(
    pos_from,
    pos_to,
    intensity,
    valid,
    light_ray_step_size,
    max_points_per_light: int,
):
    """Discretize segment lights into point lights.

    Args:
      pos_from/pos_to: (L, 3) segment endpoints (world space).
      intensity: (L,) light intensities.
      valid: (L,) bool — which light slots hold real lights.
      light_ray_step_size: scalar step between sub-lights.
      max_points_per_light: static cap S on points per segment.

    Returns (positions (L*S, 3), intensities (L*S,), valid (L*S,)).
    Sub-light s sits at from + s*step*dir, s in [0, floor(len/step)), with
    intensity I/steps; segments shorter than one step contribute nothing
    (loop body never runs in the reference).
    """
    seg = pos_to - pos_from
    length = jnp.linalg.norm(seg, axis=-1)
    direction = seg / jnp.where(length[..., None] > 0.0, length[..., None], 1.0)
    steps = (length / light_ray_step_size).astype(jnp.int32)
    steps_c = jnp.minimum(steps, max_points_per_light)
    s = jnp.arange(max_points_per_light, dtype=jnp.float32)
    pts = (
        pos_from[:, None, :]
        + (s[None, :, None] * light_ray_step_size) * direction[:, None, :]
    )
    sub_valid = (
        valid[:, None]
        & (s[None, :].astype(jnp.int32) < steps_c[:, None])
        & (steps[:, None] > 0)
    )
    # Reference divides by the *uncapped* step count (uint division semantics).
    sub_int = jnp.where(
        steps[:, None] > 0,
        intensity[:, None] / jnp.maximum(steps[:, None], 1).astype(jnp.float32),
        0.0,
    )
    L, S = pts.shape[0], pts.shape[1]
    return (
        pts.reshape(L * S, 3),
        jnp.broadcast_to(sub_int, (L, S)).reshape(L * S),
        sub_valid.reshape(L * S),
    )


def compact_valid(positions, intensities, valid, capacity: int):
    """Deterministically pack valid lights into a fixed-size buffer.

    Replaces the reference's atomic-append buffer shape for the *expanded*
    Ray/Beam sub-lights: rank = prefix-count of valid entries, scatter by
    rank, drop overflow (counted).  Returns (pos (C,3), inten (C,), valid
    (C,), n_dropped).
    """
    rank = cumsum_1d(valid.astype(jnp.int32))
    keep = valid & (rank <= capacity)
    dest = jnp.where(keep, rank - 1, capacity)
    out_pos = jnp.zeros((capacity, 3), positions.dtype).at[dest].set(
        positions, mode="drop"
    )
    out_int = jnp.zeros((capacity,), intensities.dtype).at[dest].set(
        intensities, mode="drop"
    )
    total = jnp.sum(valid.astype(jnp.int32))
    count = jnp.minimum(total, capacity)
    out_valid = jnp.arange(capacity) < count
    return out_pos, out_int, out_valid, total - count


def gather_point_lights(sample_pos, light_pos, light_intensity, light_valid):
    """Sum point-light contributions over the light axis.

    sample_pos: (N, 3); lights: (L, 3)/(L,). Returns (N,) scalar radiance
    (white light — the RGB value is this scalar broadcast to 3 channels).
    Straightforward XLA reference path; the Pallas/MXU kernel in
    ops/pallas/gather_kernel.py computes the same sum blockwise.
    """
    d2 = jnp.sum(
        (sample_pos[:, None, :] - light_pos[None, :, :]) ** 2, axis=-1
    )
    contrib = light_intensity[None, :] / (FOUR_PI * d2)
    contrib = jnp.where((d2 < GUARD) | ~light_valid[None, :], 0.0, contrib)
    return jnp.sum(contrib, axis=-1)


def gather_sphere_lights(
    sample_pos, center, light_intensity, light_valid, beam_radius
):
    """Sum sphere-light contributions over the light axis. (N,) scalar."""
    diff = sample_pos[:, None, :] - center[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    d2 = (dist - beam_radius) ** 2
    contrib = light_intensity[None, :] / (FOUR_PI * d2)
    contrib = jnp.where(
        (d2 < GUARD) | (dist == 0.0) | ~light_valid[None, :], 0.0, contrib
    )
    return jnp.sum(contrib, axis=-1)
