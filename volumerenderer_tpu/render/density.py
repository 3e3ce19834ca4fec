"""Headless density-integral renderer — the CPU_test harness equivalent
(CPU_test/main.cpp:25-43, 103-126).

Reference behavior: 256x256 pinhole render (camera (0,250,-800), fov 45);
each ray accumulates ``density += value(floor(pos)) * dt`` for t in
[0, 1200) with dt = 1; grayscale output ``min(density * 5, 255)``.

Quirk preserved: the reference uses the *world-space* position directly as a
NanoVDB index coordinate — no world->index transform (CPU_test/main.cpp:34-37).
``apply_transform=True`` gives the corrected behavior.

This is the "minimum end-to-end slice": camera math + volume sampling +
a fixed-trip-count march, fully vectorized, one jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..grid.dense import DenseGrid
from ..ops import camera


def render_density(
    grid: DenseGrid,
    *,
    width: int = 256,
    height: int = 256,
    camera_pos=(0.0, 250.0, -800.0),
    fov: float = 45.0,
    t_max: float = 1200.0,
    dt: float = 1.0,
    num_steps: int | None = None,
    apply_transform: bool = False,
) -> jax.Array:
    """Return the accumulated density integral, (H, W) float32.

    ``min(density * 5, 255) / 255`` of this is the reference PPM image.
    """
    if num_steps is None:
        num_steps = int(t_max / dt)
    return _render_density(
        grid,
        jnp.asarray(camera_pos, jnp.float32),
        jnp.asarray(fov, jnp.float32),
        jnp.asarray(dt, jnp.float32),
        width=width,
        height=height,
        num_steps=num_steps,
        apply_transform=apply_transform,
    )


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "num_steps", "apply_transform"),
)
def _render_density(
    grid: DenseGrid,
    camera_pos,
    fov,
    dt,
    *,
    width: int,
    height: int,
    num_steps: int,
    apply_transform: bool,
) -> jax.Array:
    o_w, d_w = camera.camera_rays(width, height, fov, jnp.asarray(camera_pos))
    if apply_transform:
        o = grid.world_to_index(o_w.reshape(-1, 3))
        d = grid.world_to_index_dir(d_w.reshape(-1, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    else:
        o = o_w.reshape(-1, 3)
        d = d_w.reshape(-1, 3)

    def step(k, acc):
        pos = o + d * (k.astype(jnp.float32) * dt)
        return acc + grid.sample_nearest(pos) * dt

    acc = jax.lax.fori_loop(
        0, num_steps, lambda k, a: step(k, a), jnp.zeros(o.shape[0])
    )
    return acc.reshape(height, width)


def to_grayscale_u8(density: jax.Array) -> jax.Array:
    """min(density * 5, 255) as uint8 (CPU_test/main.cpp:118)."""
    return jnp.minimum(density * 5.0, 255.0).astype(jnp.uint8)
