"""Pinhole camera ray generation — parity with the color shaders' setup.

The reference camera (e.g. point_compute_color.comp:26-38, identical in
CPU_test/main.cpp:99-110) always looks down +z with no orientation control:

    x = (2 (px + 0.5) / W - 1) * aspect * tan(fov/2)
    y = (1 - 2 (py + 0.5) / H) * tan(fov/2)
    dir = normalize(x, y, 1)

``camera_rays`` vectorizes this over the whole image at once.  An optional
look-at orientation (absent in the reference) is provided as an extension.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def camera_rays(
    width: int,
    height: int,
    fov_deg,
    camera_pos,
    look_rotation=None,
    row_start=0,
    num_rows: int | None = None,
):
    """Return (origins, directions), each (num_rows, W, 3) float32, world.

    Row j is image row ``row_start + j`` (y flipped, matching
    gl_GlobalInvocationID.y order); the projection uses the FULL image
    dimensions, so a row slice renders identically to the corresponding
    slice of the full frame — this is what makes pixel-row sharding across
    a device mesh exact.  ``look_rotation``: optional (3,3) rotation applied
    to directions (camera-space +z forward); None reproduces the reference's
    fixed +z look.
    """
    if num_rows is None:
        num_rows = height
    scale = jnp.tan(jnp.asarray(fov_deg, jnp.float32) * jnp.float32(0.5 * np.pi / 180.0))
    aspect = jnp.float32(width / height)
    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = (
        jnp.asarray(row_start, jnp.float32)
        + jnp.arange(num_rows, dtype=jnp.float32)[:, None]
    )
    x = (2.0 * (px + 0.5) / width - 1.0) * aspect * scale
    y = (1.0 - 2.0 * (py + 0.5) / height) * scale
    x = jnp.broadcast_to(x, (num_rows, width))
    y = jnp.broadcast_to(y, (num_rows, width))
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    if look_rotation is not None:
        # Explicit matvec (see grid.transforms._matvec3): an einsum here
        # would hit the MXU at default bf16 precision on TPU.
        m = look_rotation
        d = jnp.stack(
            [
                m[0, 0] * d[..., 0] + m[0, 1] * d[..., 1] + m[0, 2] * d[..., 2],
                m[1, 0] * d[..., 0] + m[1, 1] * d[..., 1] + m[1, 2] * d[..., 2],
                m[2, 0] * d[..., 0] + m[2, 1] * d[..., 1] + m[2, 2] * d[..., 2],
            ],
            axis=-1,
        )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray(camera_pos, jnp.float32), d.shape)
    return o, d


def look_at_rotation(eye, target, up=(0.0, 1.0, 0.0)):
    """Rotation matrix sending camera-space +z to (target - eye).

    Extension beyond the reference (which has no camera orientation).
    """
    eye = jnp.asarray(eye, jnp.float32)
    fwd = jnp.asarray(target, jnp.float32) - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    up = jnp.asarray(up, jnp.float32)
    right = jnp.cross(up, fwd)
    right = right / jnp.linalg.norm(right)
    true_up = jnp.cross(fwd, right)
    return jnp.stack([right, true_up, fwd], axis=1)
