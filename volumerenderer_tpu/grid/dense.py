"""Bricked dense density volume — the TPU-native replacement for NanoVDB.

The reference traverses a pointer-free NanoVDB tree on the GPU
(shaders/PNanoVDB_GLSL.h; grid/tree/root/upper/lower/leaf at
PNanoVDB_GLSL.h:556-1317).  Pointer-chasing tree traversal is hostile to a
vector machine, so on TPU we ingest the sparse tree *on the host* into a
dense, bricked density volume resident in HBM:

  * ``voxels``       — (nx, ny, nz) float32 covering the active bounding box
                       inclusive, padded up to the brick size.  Voxel (i,j,k)
                       in index space lives at ``voxels[i-bx, j-by, k-bz]``
                       with (bx,by,bz) = bbox_min.
  * ``brick_occ``    — (nx/B, ny/B, nz/B) bool: any voxel in the brick > 0.
                       B = 8 matches the NanoVDB leaf granularity
                       (PNanoVDB_GLSL.h:1312-1317) and drives early-out.
  * ``brick_max``    — per-brick max density, for adaptive/majorant schemes.
  * affine map       — (3,3) matrix + translation, same semantics as the
                       NanoVDB grid map (PNanoVDB_GLSL.h:2423-2493).

Out-of-bbox lookups return 0.0, matching the background value of the
reference's FloatGrid (bunny_cloud is a fog volume with background 0).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import transforms

BRICK = 8

# Brick-table lookups switch from a scattered jnp.take to the arithmetic
# compare-select below when (xy rows x 32-bit z words) fits this bound —
# beyond it the per-sample op count exceeds the gather it replaces.
# Measured on v5e at the 1080p counts-pass batch (39M lookups,
# scripts/probe_occ_select.py): take is flat ~390 ms (fetch-count-bound);
# select is 18.7 ms at 144 terms (96^3-class), 38.7 ms at 576 (192^3),
# 578 ms at 4608 (384^3 — loses).  2048 keeps a ~1.6x margin at the bound.
_OCC_SELECT_MAX_TERMS = 2048


def _occ_table_lookup(table, relb):
    """Occupancy-table lookup at brick coords relb (..., 3) int32 (already
    clipped in-range).

    Small tables (96^3-class volumes: 12^3 bricks) use NO gather at all:
    the z axis is bit-packed into uint32 words (computed from the table
    inside the program — 100s of elements, constant-folded/fused by XLA)
    and the (x, y) row is selected by a fused compare-sum over the row
    axis, then the z bit extracted with a variable shift.  Scattered
    jnp.take on tiny tables runs at the flat-gather rate (~90 Mfetch/s on
    v5e) and dominated the compact-view rebuild (411 ms of a 1.7 s settle
    at 1080p); the arithmetic select is compute-bound VPU work instead
    (measured ~20x faster at the same call sites).  Bit-identical results.

    Large tables with Z <= 128 use the same z-row formulation as
    ``sample_ijk``: gather a whole z-row per lookup (full-minor-dim row
    gathers lower ~3x faster than per-element flat gathers) and select
    the z element in-register — exact, measured 0.43 vs 1.32 ms at the
    asset-scale PATH chunk shape (scripts/probe_select_cost.py, 49x45x39
    table, 161k lookups, v5e).  Z > 128 brick tables (volumes deeper
    than 1024 voxels) keep the flat jnp.take path — short-minor-dim row
    gathers measure WORSE than flat (see _zrow_len), and splitting a
    bool table's rows is not worth the table bloat at that scale.
    """
    X, Y, Z = table.shape
    W = -(-Z // 32)
    if X * Y * W > _OCC_SELECT_MAX_TERMS:
        if Z <= 128:
            rows = jnp.take(table.reshape(X * Y, Z),
                            relb[..., 0] * Y + relb[..., 1],
                            axis=0, mode="clip")
            selz = (
                jax.lax.broadcasted_iota(jnp.int32, rows.shape,
                                         rows.ndim - 1)
                == relb[..., 2:3]
            )
            return jnp.any(rows & selz, axis=-1)
        lin = (relb[..., 0] * Y + relb[..., 1]) * Z + relb[..., 2]
        return jnp.take(table.reshape(-1), lin, mode="clip")
    t = table.reshape(X * Y, Z).astype(jnp.uint32)
    words = []
    for w in range(W):
        lo = 32 * w
        hi = min(lo + 32, Z)
        sh = jnp.arange(hi - lo, dtype=jnp.uint32)
        words.append(jnp.sum(t[:, lo:hi] << sh, axis=-1, dtype=jnp.uint32))
    linxy = relb[..., 0] * Y + relb[..., 1]
    rows = jnp.arange(X * Y, dtype=jnp.int32)
    eq = linxy[..., None] == rows
    bz = relb[..., 2].astype(jnp.uint32)
    word = jnp.sum(jnp.where(eq, words[0], jnp.uint32(0)), axis=-1,
                   dtype=jnp.uint32)
    for w in range(1, W):
        word_w = jnp.sum(jnp.where(eq, words[w], jnp.uint32(0)), axis=-1,
                         dtype=jnp.uint32)
        word = jnp.where(bz >= jnp.uint32(32 * w), word_w, word)
    bit = (word >> (bz % jnp.uint32(32))) & jnp.uint32(1)
    return bit.astype(bool)


@struct.dataclass
class DenseGrid:
    """Pytree holding the volume; safe to close over or pass through jit."""

    voxels: jax.Array  # (nx, ny, nz) f32, padded to multiples of BRICK
    bbox_min: jax.Array  # (3,) i32 — inclusive, index space
    bbox_max: jax.Array  # (3,) i32 — inclusive, index space
    map_mat: jax.Array  # (3,3) f32 index->world
    map_inv: jax.Array  # (3,3) f32 world->index
    map_vec: jax.Array  # (3,) f32 translation
    brick_occ: jax.Array  # (nbx, nby, nbz) bool
    brick_max: jax.Array  # (nbx, nby, nbz) f32
    brick_occ_dil: jax.Array  # (nbx, nby, nbz) bool, 3^3 dilation of occ

    # ---- transforms (parity with pnanovdb_grid_{world_to_indexf,...}) ----

    def world_to_index(self, p):
        return transforms.world_to_index(self.map_inv, self.map_vec, p)

    def index_to_world(self, p):
        return transforms.index_to_world(self.map_mat, self.map_vec, p)

    def world_to_index_dir(self, d):
        return transforms.world_to_index_dir(self.map_inv, d)

    # ---- bbox corners as floats, reference convention boxMax = max+1 ----
    # (e.g. point_compute_color.comp:53-54)

    @property
    def box_min_f(self):
        return self.bbox_min.astype(jnp.float32)

    @property
    def box_max_f(self):
        return (self.bbox_max + 1).astype(jnp.float32)

    # ---- sampling ----

    def sample_ijk(self, ijk):
        """Nearest-voxel fetch at integer coords ijk (..., 3) int32.

        Matches ``pnanovdb_readaccessor_get_value_address`` + read_float with
        the shaders' explicit in-bbox guard: out-of-bbox returns 0.

        Fetch formulation: gather a contiguous z-SUB-ROW per sample and
        select the element in-register (exact — a one-hot select of finite
        data).  TPU XLA lowers full-minor-dim row gathers ~2.5x faster
        than per-element flat gathers (measured 272 vs 109 Mfetch/s at
        96^3).  Volumes deeper than 128 gather sub-rows of _zrow_len(nz)
        — the largest divisor of nz in [96, 128] — instead of whole
        z-rows (round 3): at production depth the whole-row form LOSES to
        the flat gather (62 vs 73 Mfetch/s at nz=312) while sub-row 104
        wins (88), the one-hot select narrows nz/sub-fold, and the
        materialized row table that forces zrow_tile_cap's march-tile
        budget shrinks by the same factor.  nz with no divisor in
        [96, 128] falls back to the flat gather (short sub-rows measure
        WORSE than flat — see _zrow_len).
        """
        rel = ijk - self.bbox_min
        shape = jnp.asarray(self.voxels.shape, jnp.int32)
        inb = jnp.all((rel >= 0) & (rel < shape), axis=-1)
        relc = jnp.clip(rel, 0, shape - 1)
        nz = self.voxels.shape[2]
        sub = _zrow_len(nz)
        if sub:
            nrow = nz // sub
            rows2d = self.voxels.reshape(-1, sub)
            row = relc[..., 0] * self.voxels.shape[1] + relc[..., 1]
            if nrow > 1:
                row = row * nrow + relc[..., 2] // sub
            rows = jnp.take(rows2d, row, axis=0, mode="clip")
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
                == (relc[..., 2:3] % sub if nrow > 1 else relc[..., 2:3])
            )
            vals = jnp.sum(jnp.where(sel, rows, 0.0), axis=-1)
        else:
            lin = (
                relc[..., 0] * shape[1] + relc[..., 1]
            ) * shape[2] + relc[..., 2]
            vals = jnp.take(self.voxels.reshape(-1), lin, mode="clip")
        return jnp.where(inb, vals, 0.0)

    def sample_nearest(self, pos):
        """Fetch at floor(pos) for float index-space positions (..., 3)."""
        return self.sample_ijk(jnp.floor(pos).astype(jnp.int32))

    def brick_occupancy_at(self, pos):
        """Brick-occupancy test at float index-space positions (..., 3).

        True iff floor(pos) lies in an occupied 8^3 brick (brick_occ =
        brick_max > 0, so False guarantees the voxel value is exactly 0.0
        under nearest sampling).  The table is ~voxels/512 entries — VMEM
        resident — so this is the cheap pre-test that lets the march skip
        fetching from the full HBM volume (ops.march occupied_cap).
        """
        ijk = jnp.floor(pos).astype(jnp.int32)
        rel = ijk - self.bbox_min
        shape = jnp.asarray(self.voxels.shape, jnp.int32)
        inb = jnp.all((rel >= 0) & (rel < shape), axis=-1)
        relb = jnp.clip(rel, 0, shape - 1) // BRICK
        occ = _occ_table_lookup(self.brick_occ, relb)
        return occ & inb

    def brick_occupancy_dilated_at(self, pos):
        """1-brick-dilated occupancy at float index positions (..., 3).

        True iff floor(pos)'s brick or ANY 3^3 neighbor is occupied.  Used
        by the coarse march selection (ops.march): testing the dilated
        table only at both endpoints of an 8-voxel cell covers every brick
        the cell's fine samples can touch (a straight 8-voxel segment moves
        at most 2 brick coords per axis, monotonically, so every brick on
        it is within 1 of an endpoint brick).  Out-of-volume positions
        return True iff floor(pos) is within one brick of the volume (the
        clamp maps them to the nearest boundary brick) — a conservative
        superset, never an omission."""
        ijk = jnp.floor(pos).astype(jnp.int32)
        rel = ijk - self.bbox_min
        shape = jnp.asarray(self.voxels.shape, jnp.int32)
        pad = jnp.all((rel >= -BRICK) & (rel < shape + BRICK), axis=-1)
        relb = jnp.clip(rel, 0, shape - 1) // BRICK
        occ = _occ_table_lookup(self.brick_occ_dil, relb)
        return occ & pad

    def sample_trilinear(self, pos):
        """Trilinear interpolation at float index-space positions (..., 3).

        Not used by the parity path (the reference samples nearest voxel);
        provided as the higher-quality option.
        """
        p = pos - 0.5  # voxel centers at integer + 0.5 convention
        p0 = jnp.floor(p)
        f = p - p0
        i0 = p0.astype(jnp.int32)
        acc = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (
                        (f[..., 0] if dx else 1.0 - f[..., 0])
                        * (f[..., 1] if dy else 1.0 - f[..., 1])
                        * (f[..., 2] if dz else 1.0 - f[..., 2])
                    )
                    acc = acc + w * self.sample_ijk(
                        i0 + jnp.asarray([dx, dy, dz], jnp.int32)
                    )
        return acc


def _zrow_len(nz: int) -> int:
    """Sub-row length for ``sample_ijk``'s z-row gather: nz itself when it
    fits a vreg row span (<= 128, the proven-fused regime), else the
    largest divisor of nz in [96, 128], else 0 (flat-gather fallback).

    The floor is measured, not guessed (scripts/microbench_zrow_deep.py,
    392x360x312 / 16.7M random fetches on v5e): sub-row 104 = 88 Mfetch/s
    vs flat take 73 vs whole-row 312 = 62 (the round-2 formulation LOSES
    to flat at production depth) vs sub-row 78 = 70 (~flat) vs sub-row 52
    = 15 (collapses).  Short minor dims waste gather lanes, so only rows
    near the full 128-lane span beat the flat gather on deep volumes."""
    if nz <= 128:
        return nz
    return max((d for d in range(96, 129) if nz % d == 0), default=0)


def zrow_tile_cap(grid: DenseGrid, s_eff: int, tile: int) -> int:
    """Cap a march tile so ``sample_ijk``'s z-row fetch table stays bounded.

    Deep volumes are fetched by z-sub-row gather + one-hot select
    (``sample_ijk``); XLA fuses the (tile * s_eff, row) table when the
    volume's rows are whole z-rows (nz <= 128; proven at the 64k headline
    build tile) but MATERIALIZES gathered row tables for deeper volumes —
    measured 33.8 GB at a 64k tile with round-2 whole-nz rows (bunny
    scale, nz=440), 13.1 GB at the 16k tile inside the device build's
    rung switch and 14.5 GB in the PATH camera-segment bake (nz=312: the
    round-3 gallery OOMs).  Callers marching ``s_eff`` volume fetches per
    ray through a ray-tiled ``lax.map`` must cap their tile with this
    bound.  Tile sizes do not affect results (per-ray math only); the
    round-3 sub-row split (_zrow_len) shrinks the table nz/sub-fold, so
    the budget admits proportionally larger tiles than whole-row rounds.
    nz with no divisor in [96, 128] uses the flat gather — no row table,
    bounded fine by the ~40 B/sample march temporaries."""
    nz = grid.voxels.shape[2]
    sub = _zrow_len(nz)
    if nz <= 128 or sub == 0:
        return tile
    bound = max(256, ((3 << 29) // max(s_eff * sub * 4, 1)) // 256 * 256)
    return min(tile, bound)


def occupied_bbox(grid: DenseGrid) -> tuple[np.ndarray, np.ndarray] | None:
    """Index-space AABB of the OCCUPIED bricks (host-side, concrete).

    Everything outside is exactly zero density, so marches clipped to this
    box (grid-aligned, see render.color.build_view) are bit-identical to
    full-bbox marches while skipping vacuum skirts.  Returns (min_corner,
    max_corner_exclusive) as float arrays, or None if the volume is empty.
    """
    occ = np.asarray(grid.brick_occ)
    if not occ.any():
        return None
    idx = np.argwhere(occ)
    lo = idx.min(axis=0) * BRICK
    hi = (idx.max(axis=0) + 1) * BRICK
    bmin = np.asarray(grid.bbox_min)
    return (bmin + lo).astype(np.float32), (bmin + hi).astype(np.float32)


def _pad_to_brick(a: np.ndarray) -> np.ndarray:
    pads = [(0, (-s) % BRICK) for s in a.shape]
    if any(p[1] for p in pads):
        a = np.pad(a, pads)
    return a


def _pad_depth_for_fetch(nz: int) -> int:
    """Fetch-friendly depth for deep volumes: the smallest brick-aligned
    n >= nz with a z-sub-row divisor in [96, 128] (_zrow_len), within a
    25% memory budget.  Depths with no such divisor otherwise fall back
    to the flat per-element gather — measured ~1.2x slower than the
    sub-row form at asset scale (scripts/probe_fetch_roofline.py: 79.4
    vs 67.0 Mrows/s; the gather is row-ISSUE-bound at ~12 clocks/row and
    <= 4% of HBM peak, so extra zero bytes are free).  Zero padding is
    exact — identical to the out-of-bbox guard's 0.0, invisible to
    occupancy (pad bricks are empty) and to the tight bbox_max.  The
    production-class 438 pads to 440 (divisor 110, +0.5% memory);
    depths needing > 25% extra stay flat."""
    if nz <= 128 or _zrow_len(nz):
        return nz
    n = nz + (-nz) % BRICK
    while n - nz <= max(BRICK, nz // 4):
        if _zrow_len(n):
            return n
        n += BRICK
    return nz


def from_dense(
    values: np.ndarray,
    bbox_min=(0, 0, 0),
    voxel_size: float = 1.0,
    translation=(0.0, 0.0, 0.0),
    map_mat: np.ndarray | None = None,
) -> DenseGrid:
    """Build a DenseGrid from a dense numpy array of densities.

    ``values[i, j, k]`` is the density at index coord ``bbox_min + (i,j,k)``.
    The affine map defaults to uniform ``voxel_size`` scaling plus
    ``translation`` (the common VDB linear transform).
    """
    values = np.ascontiguousarray(values, np.float32)
    if values.ndim != 3:
        raise ValueError(f"expected 3-D density array, got shape {values.shape}")
    bbox_min = np.asarray(bbox_min, np.int32)
    bbox_max = bbox_min + np.asarray(values.shape, np.int32) - 1
    padded = _pad_to_brick(values)
    nz_fetch = _pad_depth_for_fetch(padded.shape[2])
    if nz_fetch > padded.shape[2]:
        padded = np.pad(
            padded, ((0, 0), (0, 0), (0, nz_fetch - padded.shape[2]))
        )
    nb = tuple(s // BRICK for s in padded.shape)
    bricks = padded.reshape(nb[0], BRICK, nb[1], BRICK, nb[2], BRICK)
    brick_max = bricks.max(axis=(1, 3, 5))
    if map_mat is None:
        map_mat = np.eye(3, dtype=np.float32) * np.float32(voxel_size)
    map_mat = np.asarray(map_mat, np.float32)
    occ = brick_max > 0.0
    # 3^3 binary dilation (sequential per-axis max of shifted copies).
    dil = occ.copy()
    for axis in range(3):
        shifted_f = np.zeros_like(dil)
        shifted_b = np.zeros_like(dil)
        sl = [slice(None)] * 3
        sf = [slice(None)] * 3
        sl[axis], sf[axis] = slice(1, None), slice(None, -1)
        shifted_f[tuple(sl)] = dil[tuple(sf)]
        shifted_b[tuple(sf)] = dil[tuple(sl)]
        dil = dil | shifted_f | shifted_b
    return DenseGrid(
        voxels=jnp.asarray(padded),
        bbox_min=jnp.asarray(bbox_min),
        bbox_max=jnp.asarray(bbox_max),
        map_mat=jnp.asarray(map_mat),
        map_inv=jnp.asarray(np.linalg.inv(map_mat).astype(np.float32)),
        map_vec=jnp.asarray(np.asarray(translation, np.float32)),
        brick_occ=jnp.asarray(occ),
        brick_max=jnp.asarray(brick_max.astype(np.float32)),
        brick_occ_dil=jnp.asarray(dil),
    )
