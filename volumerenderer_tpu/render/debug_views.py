"""Debug light visualizers — ports of the (unused-in-reference) helpers
``intersectPointLights`` / ``intersectRayLights`` (common_functions.h:159-180):
render the virtual light set itself instead of the volume, for inspecting
what the photon walk produced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.params import RenderParams, StaticConfig

from ..ops import camera, intersect
from .photon import LightArray


def view_point_lights(
    params: RenderParams,
    lights: LightArray,
    config: StaticConfig,
    radius: float = 0.2,
) -> jax.Array:
    """White where the camera ray hits any light's scatter point as a sphere
    of ``radius`` (common_functions.h:159-168). Returns (H, W) float."""
    H, W = config.height, config.width
    o, d = camera.camera_rays(W, H, params.fov, params.camera_pos)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    def hit_one(center, valid):
        h, _t = intersect.intersect_sphere(o, d, center, radius)
        return h & valid

    hits = jax.vmap(hit_one)(lights.pos_to, lights.valid)  # (L, N)
    return jnp.any(hits, axis=0).astype(jnp.float32).reshape(H, W)


def view_ray_lights(
    params: RenderParams,
    lights: LightArray,
    config: StaticConfig,
    width: float = 0.1,
) -> jax.Array:
    """White where the camera ray passes within ``width`` of a light segment
    (common_functions.h:170-180, including its quirk of passing the segment
    END POINT as a direction). Returns (H, W) float."""
    H, W = config.height, config.width
    o, d = camera.camera_rays(W, H, params.fov, params.camera_pos)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    def hit_one(p_from, p_to, valid):
        # Reference passes positionTo where a direction is expected
        # (common_functions.h:175, "direction vs end point not functional
        # yet"); reproduce the quirk.
        h, _t = intersect.intersect_thick_ray(o, d, p_from, p_to, width)
        return h & valid

    hits = jax.vmap(hit_one)(lights.pos_from, lights.pos_to, lights.valid)
    return jnp.any(hits, axis=0).astype(jnp.float32).reshape(H, W)
