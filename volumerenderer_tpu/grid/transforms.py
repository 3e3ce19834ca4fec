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


def index_to_world(mat, vec, p):
    """p: (..., 3) index-space position -> world space."""
    return jnp.einsum("ij,...j->...i", mat, p) + vec


def world_to_index(inv_mat, vec, p):
    """p: (..., 3) world-space position -> index space."""
    return jnp.einsum("ij,...j->...i", inv_mat, p - vec)


def world_to_index_dir(inv_mat, d):
    """d: (..., 3) world-space direction -> index space (unnormalized)."""
    return jnp.einsum("ij,...j->...i", inv_mat, d)
