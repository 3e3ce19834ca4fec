"""Minimal OpenVDB ``.vdb`` writer for round-trip testing the native reader
(native/vdb_read.cpp).  Emits the documented modern subset: file version
224, FloatGrid Tree4<float,5,4,3>, UniformScaleTranslateMap, optional zlib
compression with either all-values or active-mask node encoding.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = 0x56444220
FILE_VERSION = 224
COMPRESS_ZIP = 0x1
COMPRESS_ACTIVE_MASK = 0x2

META_MASK_AND_NO_INACTIVE_VALS = 3
META_NO_MASK_AND_ALL_VALS = 6


def _s(b: bytes) -> bytes:
    return struct.pack("<I", len(b)) + b


def _data_block(values: np.ndarray, zip_on: bool) -> bytes:
    raw = np.asarray(values, "<f4").tobytes()
    if not zip_on:
        return raw
    comp = zlib.compress(raw)
    if len(comp) < len(raw):
        return struct.pack("<q", len(comp)) + comp
    return struct.pack("<q", -len(raw)) + raw


def _compressed_values(values, value_mask_bits, zip_on, use_mask):
    """io::writeCompressedValues subset: metadata byte + data block."""
    if use_mask:
        on = values[value_mask_bits]
        return (
            struct.pack("<b", META_MASK_AND_NO_INACTIVE_VALS)
            + _data_block(on, zip_on)
        )
    return (
        struct.pack("<b", META_NO_MASK_AND_ALL_VALS)
        + _data_block(values, zip_on)
    )


def _mask_bytes(bits: np.ndarray) -> bytes:
    return np.packbits(bits.astype(np.uint8), bitorder="little").tobytes()


def write_vdb(
    path: str,
    dense: np.ndarray,
    bbox_min=(0, 0, 0),
    voxel_size: float = 1.0,
    translation=(0.0, 0.0, 0.0),
    grid_name: str = "density",
    zip_on: bool = True,
    use_mask_compression: bool = True,
) -> None:
    dense = np.asarray(dense, np.float32)
    bx, by, bz = (int(v) for v in bbox_min)

    # ---- collect leaves (8^3) and their parent lowers/uppers ----
    leaves = {}
    nx, ny, nz = dense.shape
    for x in range(nx):
        for y in range(ny):
            for z in range(nz):
                v = dense[x, y, z]
                if v == 0.0:
                    continue
                gx, gy, gz = bx + x, by + y, bz + z
                lo = (gx & ~7, gy & ~7, gz & ~7)
                lf = leaves.setdefault(
                    lo, np.zeros(512, np.float32)
                )
                off = ((gx & 7) << 6) | ((gy & 7) << 3) | (gz & 7)
                lf[off] = v
    lowers = {}
    for lo in leaves:
        lowers.setdefault((lo[0] & ~127, lo[1] & ~127, lo[2] & ~127),
                          []).append(lo)
    uppers = {}
    for lw in lowers:
        uppers.setdefault((lw[0] & ~4095, lw[1] & ~4095, lw[2] & ~4095),
                          []).append(lw)

    out = bytearray()
    out += struct.pack("<q", MAGIC)
    out += struct.pack("<I", FILE_VERSION)
    out += struct.pack("<II", 10, 0)  # library version
    out += struct.pack("<B", 1)  # hasGridOffsets
    comp = (COMPRESS_ZIP if zip_on else 0) | (
        COMPRESS_ACTIVE_MASK if use_mask_compression else 0
    )
    out += struct.pack("<I", comp)
    out += b"0" * 36  # uuid
    out += struct.pack("<I", 0)  # file metadata count

    out += struct.pack("<I", 1)  # grid count
    out += _s(grid_name.encode())
    out += _s(b"Tree_float_5_4_3")
    out += struct.pack("<B", 0)  # saveFloatAsHalf
    offsets_at = len(out)
    out += struct.pack("<qqq", 0, 0, 0)  # gridPos/blockPos/endPos (patched)

    grid_pos = len(out)
    out += struct.pack("<I", 0)  # grid metadata count
    # Transform: UniformScaleTranslateMap
    out += _s(b"UniformScaleTranslateMap")
    s = float(voxel_size)
    t = [float(v) for v in translation]
    vec3 = lambda a, b_, c: struct.pack("<ddd", a, b_, c)
    out += vec3(*t)  # mTranslation
    out += vec3(s, s, s)  # mScaleValues
    out += vec3(s, s, s)  # mVoxelSize
    out += vec3(1 / s, 1 / s, 1 / s)  # mScaleValuesInverse
    out += vec3(1 / s**2, 1 / s**2, 1 / s**2)  # mInvScaleSqr
    out += vec3(0.5 / s, 0.5 / s, 0.5 / s)  # mInvTwiceScale

    out += struct.pack("<I", 1)  # tree buffer count
    out += struct.pack("<f", 0.0)  # root background
    out += struct.pack("<II", 0, len(uppers))  # tiles, children

    leaf_order = []
    for uo in sorted(uppers):
        out += struct.pack("<iii", *uo)
        # upper internal node (32^3)
        cm = np.zeros(32768, bool)
        vm = np.zeros(32768, bool)
        vals = np.zeros(32768, np.float32)
        low_of = {}
        for lw in uppers[uo]:
            n = (((lw[0] - uo[0]) >> 7) << 10) | (((lw[1] - uo[1]) >> 7) << 5) | (
                (lw[2] - uo[2]) >> 7
            )
            cm[n] = True
            low_of[n] = lw
        out += _mask_bytes(cm) + _mask_bytes(vm)
        out += _compressed_values(vals, vm, zip_on, use_mask_compression)
        for n in sorted(low_of):
            lw = low_of[n]
            # lower internal node (16^3)
            cm2 = np.zeros(4096, bool)
            vm2 = np.zeros(4096, bool)
            vals2 = np.zeros(4096, np.float32)
            leaf_of = {}
            for lo in lowers[lw]:
                m = (((lo[0] - lw[0]) >> 3) << 8) | (
                    ((lo[1] - lw[1]) >> 3) << 4
                ) | ((lo[2] - lw[2]) >> 3)
                cm2[m] = True
                leaf_of[m] = lo
            out += _mask_bytes(cm2) + _mask_bytes(vm2)
            out += _compressed_values(vals2, vm2, zip_on, use_mask_compression)
            for m in sorted(leaf_of):
                lo = leaf_of[m]
                lf = leaves[lo]
                out += _mask_bytes(lf != 0.0)  # leaf topology: value mask
                leaf_order.append(lo)

    block_pos = len(out)
    for lo in leaf_order:
        lf = leaves[lo]
        mask = lf != 0.0
        out += _mask_bytes(mask)  # buffers re-state the value mask
        out += _compressed_values(lf, mask, zip_on, use_mask_compression)
    end_pos = len(out)

    out[offsets_at:offsets_at + 24] = struct.pack(
        "<qqq", grid_pos, block_pos, end_pos
    )
    with open(path, "wb") as f:
        f.write(out)
