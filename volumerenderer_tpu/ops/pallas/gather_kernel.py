"""Pallas TPU kernel for the many-light radiance gather.

Replaces the reference's innermost per-pixel light loop
(point_compute_color.comp:9-15, sphere_compute_color.comp:9-15 and the
expanded Ray/Beam variants) — the dominant cost of every frame,
O(pixels x marchSteps x lights).

Design (TPU-first, not a translation):

  * The (light, sample) squared-distance matrix is produced **on the MXU**:
    with A = [x; y; z; 1; |p|^2; 0; 0; 0] of shape (8, N) — samples on the
    LANE axis so the f32 (8, 128) tiling has zero padding waste — and
    B = [-2 l_x, -2 l_y, -2 l_z, |l|^2, 1, 0, 0, 0] of shape (TILE_L, 8):
    B @ A == |p|^2 + |l|^2 - 2 p.l == d^2, one K=8 matmul per
    (TILE_L x TILE_N) block.
  * The 1/(4 pi d^2) epilogue, guards, and the light-axis reduction run on
    the VPU over the same VMEM-resident block; nothing of size N x L ever
    touches HBM (the naive XLA broadcast materializes it — terabytes at
    production sizes).
  * Grid: (sample blocks, light blocks); the (1, TILE_N) output row is
    revisited across the light axis and accumulated in place (TPU grids
    iterate the last axis innermost, sequentially).
  * Invalid light slots are parked at 1e15 with zero intensity by the
    caller — no validity masks in the inner loop.
  * Numerics: the matmul form suffers cancellation ~eps * (|p|+|l|)^2; the
    caller shifts both point sets to volume-centered coordinates (d^2 is
    translation-invariant), bounding the absolute error to ~1e-4 at scene
    scale.  d^2 is clamped at 0 so the sphere path's sqrt stays real.

The intensity column is pre-divided by 4 pi, so the epilogue is a single
multiply by the guarded reciprocal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lights import FOUR_PI, GUARD

TILE_N = 4096  # samples per block (lane axis)
TILE_L = 256  # lights per inner-loop block (sublane axis)


def _kernel(rad_ref, active_ref, a_ref, b_ref, i_ref, o_ref, *, sphere: bool):
    """One sample block vs ALL lights.

    The whole (padded) light array lives in VMEM; an inner fori_loop walks
    its TILE_L-blocks.  Light-slot arrays are sized for the worst case
    (maxLights, segment-expansion caps) but frames typically populate a
    small prefix, so blocks of invalid slots are skipped inside the loop —
    cost scales with the *actual* light count, with no per-grid-step
    overhead for the empty capacity (a 2-D grid pays ~1 us per step even
    for skipped blocks; at production sizes that overhead dominated).
    """
    n_blocks = active_ref.shape[0]
    a = a_ref[:]
    radius = rad_ref[0]

    def light_block(k, acc):
        def compute(acc):
            b = b_ref[pl.ds(k * TILE_L, TILE_L), :]
            inten = i_ref[pl.ds(k * TILE_L, TILE_L), :]
            # (TILE_L, 8) @ (8, TILE_N) on the MXU.  HIGHEST: full-f32
            # 3-pass matmul — the default bf16 pass loses ~8 mantissa bits
            # of d^2, visible as %-level light errors.
            d2 = jnp.dot(
                b,
                a,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            d2 = jnp.maximum(d2, 0.0)
            if sphere:
                dist = jnp.sqrt(d2)
                dd = dist - radius
                d2e = dd * dd
                bad = (d2e < GUARD) | (dist == 0.0)
            else:
                d2e = d2
                bad = d2e < GUARD
            inv = jnp.where(bad, 0.0, 1.0 / jnp.maximum(d2e, GUARD))
            return acc + jnp.sum(inten * inv, axis=0, keepdims=True)

        return jax.lax.cond(active_ref[k] != 0, compute, lambda x: x, acc)

    o_ref[:] = jax.lax.fori_loop(
        0, n_blocks, light_block, jnp.zeros_like(o_ref)
    )


def gather_mxu(
    samples,
    l_pos,
    l_int,
    l_valid,
    *,
    sphere: bool,
    radius=0.0,
    center=None,
    interpret: bool = False,
):
    """samples (N, 3), lights (L, ...) -> (N,) radiance sums."""
    N = samples.shape[0]
    L = l_pos.shape[0]
    if center is None:
        center = jnp.zeros((3,), jnp.float32)
    center = jnp.asarray(center, jnp.float32)

    l_int = jnp.where(l_valid, l_int, 0.0) * jnp.float32(1.0 / FOUR_PI)
    l_pos = jnp.where(l_valid[:, None], l_pos - center, 1e15)
    p = samples - center

    pad_n = (-N) % TILE_N
    pad_l = (-L) % TILE_L
    p = jnp.pad(p, ((0, pad_n), (0, 0)))
    l_pos = jnp.concatenate(
        [l_pos, jnp.full((pad_l, 3), 1e15, l_pos.dtype)], axis=0
    )
    l_int = jnp.pad(l_int, (0, pad_l))
    n_pad, l_pad = N + pad_n, L + pad_l

    # A: (8, N) — samples on lanes, zero tiling waste at f32 (8, 128).
    pt = p.T  # (3, n_pad)
    a = jnp.concatenate(
        [
            pt,
            jnp.ones((1, n_pad), jnp.float32),
            jnp.sum(pt * pt, axis=0, keepdims=True),
            jnp.zeros((3, n_pad), jnp.float32),
        ],
        axis=0,
    )  # (8, n_pad)
    b = jnp.concatenate(
        [
            -2.0 * l_pos,
            jnp.sum(l_pos * l_pos, axis=-1, keepdims=True),
            jnp.ones((l_pad, 1), jnp.float32),
            jnp.zeros((l_pad, 3), jnp.float32),
        ],
        axis=1,
    )  # (l_pad, 8)

    n_l_blocks = l_pad // TILE_L
    block_active = jnp.any(
        jnp.pad(l_valid, (0, pad_l)).reshape(n_l_blocks, TILE_L), axis=1
    ).astype(jnp.int32)

    grid = (n_pad // TILE_N,)
    out = pl.pallas_call(
        functools.partial(_kernel, sphere=sphere),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # radius (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # block_active (n_l_blocks,)
            pl.BlockSpec(
                (8, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # B (l_pad, 8), whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # I (l_pad, 1), whole
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * l_pad * 8 + 4 * n_pad * l_pad,
            bytes_accessed=n_pad * 32 + l_pad * 36 + n_pad * 4,
            transcendentals=n_pad * l_pad if sphere else 0,
        ),
    )(
        jnp.asarray(radius, jnp.float32).reshape(1),
        block_active,
        a,
        b,
        l_int[:, None],
    )
    return out[0, :N]
