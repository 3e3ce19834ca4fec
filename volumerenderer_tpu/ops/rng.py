"""Counter-based spatial-hash RNG with exact parity to the reference shaders.

The reference (shaders/common_functions.h:1-25) uses a hash of a ``uvec3``
seed; every draw increments all three seed components by one and re-hashes
(``randf_inc``).  Because the state is a plain counter, the whole stream for a
thread is a *pure function of (seed0, draw_index)* — which is exactly the
counter-based-RNG shape TPUs want: we can evaluate draw ``k`` for a million
photons/pixels in one vectorized call, with no sequential carry.

All arithmetic is uint32 with wraparound, matching GLSL.  ``jax.random``
(threefry) is available as the idiomatic alternative via ``sample_sphere``
with a key, but algorithm parity uses these functions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# f32 constant the shader uses: 1.0 / 4294967295.0 evaluated in float32.
_INV_U32_MAX = np.float32(1.0) / np.float32(4294967295.0)

_HX = np.uint32(73856093)
_HY = np.uint32(19349663)
_HZ = np.uint32(83492791)
_HM = np.uint32(0x45D9F3B)


def hash_uvec3(x, y, z):
    """Spatial hash + double xorshift-multiply (common_functions.h:2-11).

    Args are uint32 arrays (or ints); returns uint32 array.
    """
    x = jnp.asarray(x, jnp.uint32)
    y = jnp.asarray(y, jnp.uint32)
    z = jnp.asarray(z, jnp.uint32)
    h = (x * _HX) ^ (y * _HY) ^ (z * _HZ)
    h = (h ^ (h >> 16)) * _HM
    h = (h ^ (h >> 16)) * _HM
    h = h ^ (h >> 16)
    return h


def randf(x, y, z):
    """float in [0, 1]: float(hash(seed)) / 4294967295 (common_functions.h:12-14)."""
    return hash_uvec3(x, y, z).astype(jnp.float32) * _INV_U32_MAX


def randf_at(seed, k):
    """The value ``randf_inc`` would return on its ``k``-th call (1-indexed).

    ``randf_inc`` (common_functions.h:16-19) increments all three components
    by 1 and hashes, so call ``k`` sees ``seed + (k, k, k)``.  ``seed`` is a
    (..., 3) uint32 array; ``k`` broadcasts against its leading dims.
    """
    seed = jnp.asarray(seed, jnp.uint32)
    k = jnp.asarray(k, jnp.uint32)
    return randf(seed[..., 0] + k, seed[..., 1] + k, seed[..., 2] + k)


def advance(seed, n):
    """Seed state after ``n`` randf_inc calls."""
    seed = jnp.asarray(seed, jnp.uint32)
    return seed + jnp.asarray(n, jnp.uint32)[..., None]


def draw(seed):
    """One ``randf_inc`` step: returns (value, new_seed)."""
    seed = jnp.asarray(seed, jnp.uint32) + jnp.uint32(1)
    return randf(seed[..., 0], seed[..., 1], seed[..., 2]), seed


def make_seed(gid_x, gid_y, gid_z, frame_count):
    """Per-thread seed: ``uvec3(gid) * frameCount`` (light_gen.comp:15,
    path_compute_color.comp:37).  Componentwise uint32 wraparound multiply."""
    fc = jnp.asarray(frame_count, jnp.uint32)
    return jnp.stack(
        [
            jnp.asarray(gid_x, jnp.uint32) * fc,
            jnp.asarray(gid_y, jnp.uint32) * fc,
            jnp.asarray(gid_z, jnp.uint32) * fc,
        ],
        axis=-1,
    )


def random_dir(r1, r2):
    """Uniform direction on the sphere (common_functions.h:21-25).

    theta = acos(1 - 2 r1), phi = 2 pi r2; returns (..., 3) float32.
    """
    r1 = jnp.asarray(r1, jnp.float32)
    r2 = jnp.asarray(r2, jnp.float32)
    theta = jnp.arccos(jnp.clip(1.0 - 2.0 * r1, -1.0, 1.0))
    phi = jnp.float32(2.0 * np.pi) * r2
    st = jnp.sin(theta)
    d = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1)
    # The reference normalizes (a no-op up to rounding); match it.
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)
