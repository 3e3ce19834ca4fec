"""World <-> index affine transforms for sparse volume grids.

Mirrors the NanoVDB map semantics the reference shaders rely on
(shaders/PNanoVDB_GLSL.h:2423-2493):

  * ``index_to_world(p) = mat @ p + vec``          (map_apply)
  * ``world_to_index(p) = inv_mat @ (p - vec)``    (map_apply_inverse)
  * ``world_to_index_dir(d) = inv_mat @ d``        (inverse Jacobian, no
    translation; callers normalize afterwards)

The transform is stored as a (3,3) matrix + translation so arbitrary affine
VDB maps work; the common case is uniform scale + translation.
"""

from __future__ import annotations

import jax.numpy as jnp


def _matvec3(m, p):
    """(3,3) @ (..., 3) as explicit elementwise multiply-adds.

    NOT an einsum/dot: on TPU a traced f32 matmul runs on the MXU at the
    DEFAULT precision, which rounds the operands to bf16 — ~8 lost
    mantissa bits in every camera origin, ray direction, and world-space
    sample position (0.2%-scale errors, enough to flip voxel floors and
    shift light distances).  Explicit muls stay on the VPU in full f32 —
    bit-exact vs the reference's scalar math, and faster than an MXU
    dispatch for a 3-vector."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return jnp.stack(
        [
            m[0, 0] * x + m[0, 1] * y + m[0, 2] * z,
            m[1, 0] * x + m[1, 1] * y + m[1, 2] * z,
            m[2, 0] * x + m[2, 1] * y + m[2, 2] * z,
        ],
        axis=-1,
    )


def index_to_world(mat, vec, p):
    """p: (..., 3) index-space position -> world space."""
    return _matvec3(mat, p) + vec


def world_to_index(inv_mat, vec, p):
    """p: (..., 3) world-space position -> index space."""
    return _matvec3(inv_mat, p - vec)


def world_to_index_dir(inv_mat, d):
    """d: (..., 3) world-space direction -> index space (unnormalized)."""
    return _matvec3(inv_mat, d)
