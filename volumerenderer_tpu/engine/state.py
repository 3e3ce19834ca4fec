"""Render state: the progressive accumulation buffer + frame counter.

The reference keeps these as a GPU storage image (rgba8, src/main.cpp:338-378)
and a UBO uint; here they form an explicit pytree value, so
checkpoint/resume, multi-chip sharding, and "Refresh" semantics are all just
functional updates (the reference loses the image on resize because
recreateSwapChain zeroes frameCount, src/main.cpp:936-937).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RenderState:
    accum: jax.Array  # (H, W) f32 scalar radiance (white light)
    frame_count: jax.Array  # () int32; 0 == "cleared / restart accumulation"

    @classmethod
    def create(cls, height: int, width: int) -> "RenderState":
        return cls(
            accum=jnp.zeros((height, width), jnp.float32),
            frame_count=jnp.zeros((), jnp.int32),
        )

    def refresh(self) -> "RenderState":
        """ImGui 'Refresh' button / algorithm switch (src/main.cpp:651-698):
        zero the frame counter so the next frame clears and restarts."""
        return self.replace(frame_count=jnp.zeros((), jnp.int32))

    def rgb(self) -> jax.Array:
        """(H, W, 3) view — white lights broadcast to RGB."""
        return jnp.broadcast_to(self.accum[..., None], (*self.accum.shape, 3))

    def rgb_u8(self) -> jax.Array:
        """rgba8-storage-image view of the accumulator."""
        return (jnp.clip(self.rgb(), 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def accumulate(accum, frame, frame_count, quantize_u8: bool = False):
    """Progressive average (point_compute_color.comp:97-105):

        new = (prev * (N - 1) + frame) / N,  N = frameCount (1-based).

    The reference's storage image is rgba8, so its accumulator quantizes to
    8 bits every frame; ``quantize_u8=True`` reproduces that (useful for
    bit-level comparisons), the default keeps full float32 precision.
    """
    n = frame_count.astype(jnp.float32)
    new = (accum * (n - 1.0) + frame) / n
    if quantize_u8:
        q = jnp.round(jnp.clip(new, 0.0, 1.0) * 255.0) / 255.0
        new = q
    return new
