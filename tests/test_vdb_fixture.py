"""Externally-derived .vdb fixtures: byte streams hand-assembled here, field
by field, from the PUBLISHED OpenVDB file-format documentation (openvdb.org
"I/O" docs + the io/Archive / io/Compression / tree serialization layouts,
the same spec the reference app's library consumes — see
/root/reference/src/main.cpp:1157-1191) — deliberately importing NOTHING
from tests/vdb_writer.py or the native writer, so the reader is validated
against an independent third derivation of the format rather than
round-tripping its sibling (the round-2 blockPos/blosc-flag bugs were
exactly the class of error such circularity hides).

No file with true external provenance can be produced in this environment
(no network, no OpenVDB build, no pyopenvdb); these fixtures are the
documented fallback.  They also cover reader paths NO in-repo writer emits:

  * saveFloatAsHalf grids (binary16 value buffers, raw-block form)
  * root-level tiles and internal-node value tiles
  * TranslationMap and AffineMap transforms
  * multi-grid files with a non-float grid skipped via its end offset
  * unique-name "\\x1e" suffix convention
  * nonzero file/grid metadata maps
  * per-node compression meta 4 (mask + one inactive value)
  * wrong-codec-flag corpus (declared blosc, zlib payload, etc.)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from volumerenderer_tpu.grid import vdbio_native as V


def _u32(v):
    return struct.pack("<I", v)


def _i32(v):
    return struct.pack("<i", v)


def _i64(v):
    return struct.pack("<q", v)


def _f32(v):
    return struct.pack("<f", v)


def _dbl3(a, b, c):
    return struct.pack("<ddd", a, b, c)


def _name(s: bytes) -> bytes:
    return _u32(len(s)) + s


def _bits(n_bits: int, on) -> bytes:
    """Little-endian bit packing (bit i of the stream = byte i>>3, bit
    i&7), written as an explicit loop from the spec rather than reusing
    any in-repo mask helper."""
    out = bytearray((n_bits + 7) // 8)
    for i in on:
        out[i >> 3] |= 1 << (i & 7)
    return bytes(out)


def _meta_entry(name: bytes, typ: bytes, payload: bytes) -> bytes:
    return _name(name) + _name(typ) + _i32(len(payload)) + payload


def _zip_block(raw: bytes) -> bytes:
    """io::writeData ZIP form: int64 stored size; negative = raw passthru
    (emitted when compression would not shrink the payload)."""
    comp = zlib.compress(raw)
    if len(comp) < len(raw):
        return _i64(len(comp)) + comp
    return _i64(-len(raw)) + raw


# per-node compression metadata (io/Compression.h)
META_NO_MASK_AND_ALL_VALS = 6
META_MASK_AND_NO_INACTIVE = 3
META_MASK_AND_ONE_INACTIVE = 4


def halfsink_fixture() -> bytes:
    """Two-grid file, version 223, ZIP+ACTIVE_MASK compression.  Grid 1 is
    an int32 tree the reader must skip via its end offset; grid 2 is a
    saveFloatAsHalf FloatGrid "density\\x1e[1]" under a TranslationMap
    with: one INACTIVE root tile, one upper child at (0,0,0) holding one
    lower child, and inside it one leaf (voxels (0,0,0)=1.5,
    (1,2,3)=-2.25) plus one ACTIVE 8^3 value tile at (8,0,0) = 0.25.
    Expected dense: bbox (0,0,0)-(15,7,7)."""
    out = bytearray()
    out += _i64(0x56444220)  # magic: int64 " BDV" little-endian
    out += _u32(223)  # file version (NODE_MASK_COMPRESSION era)
    out += _u32(9) + _u32(0)  # library version 9.0
    out += bytes([1])  # hasGridOffsets
    out += _u32(0x1 | 0x2)  # COMPRESS_ZIP | COMPRESS_ACTIVE_MASK
    out += b"a" * 36  # uuid (36 ascii chars)
    # file metadata: one entry the reader must skip by its byte size
    out += _u32(1)
    out += _meta_entry(b"creator", b"string", _u32(8) + b"openvdb!")

    out += _u32(2)  # grid count

    # ---- grid 1: non-float, skipped via end offset ----
    out += _name(b"flags\x1e[0]") + _name(b"Tree_int32_5_4_3") + bytes([0])
    off1_at = len(out)
    out += _i64(0) * 3
    g1 = len(out)  # grid data begins right after the offsets
    out += b"\xde\xad\xbe\xef" * 3  # opaque: reader must never parse it
    end1 = len(out)
    out[off1_at:off1_at + 24] = _i64(g1) + _i64(g1) + _i64(end1)

    # ---- grid 2: the target half-float grid ----
    out += _name(b"density\x1e[1]") + _name(b"Tree_float_5_4_3") + bytes([1])
    off2_at = len(out)
    out += _i64(0) * 3
    grid_pos = len(out)
    # grid metadata: one skippable entry (string payloads carry their own
    # embedded length prefix inside the counted bytes)
    out += _u32(1)
    out += _meta_entry(b"class", b"string", _u32(9) + b"fogvolume")
    out += _name(b"TranslationMap") + _dbl3(2.0, -3.0, 4.5)

    out += _u32(1)  # tree buffer count
    out += _f32(0.0)  # background
    out += _u32(1) + _u32(1)  # one root tile, one root child
    # inactive root tile: parsed, never rasterized, bbox untouched
    out += _i32(-4096) + _i32(0) + _i32(4096) + _f32(7.5) + bytes([0])

    # upper internal child at (0,0,0): child 0 on, no value tiles
    out += _i32(0) * 3
    out += _bits(32768, [0])  # child mask
    out += _bits(32768, [])  # value mask
    # meta + empty mask-compressed block (countOn == 0): header only
    out += bytes([META_MASK_AND_NO_INACTIVE]) + _zip_block(b"")

    # lower internal at (0,0,0): leaf child at local 0; active value tile
    # at local offset for (8,0,0): ((8>>3) << 8) = 256
    out += _bits(4096, [0])  # child mask
    out += _bits(4096, [256])  # value mask -> one ACTIVE tile
    # saveFloatAsHalf applies to EVERY node value buffer, internals too.
    # Meta 6 (all values) on a 4096-entry half buffer: the one block big
    # enough to be GENUINELY zlib-compressed (the tiny leaf/tile blocks
    # all take the raw-passthru framing), so codec mismatches are caught.
    low_vals = np.zeros(4096, "<f2")
    low_vals[256] = 0.25
    out += bytes([META_NO_MASK_AND_ALL_VALS]) + _zip_block(
        low_vals.tobytes())

    # leaf topology at (0,0,0): 512-bit value mask only
    voxel_on = [0, (1 << 6) | (2 << 3) | 3]  # (0,0,0) and (1,2,3)
    out += _bits(512, voxel_on)

    # ---- leaf buffers (topology order) ----
    out += _bits(512, voxel_on)  # value mask restated
    halves = np.array([1.5, -2.25], "<f2").tobytes()  # binary16 buffers
    out += bytes([META_MASK_AND_ONE_INACTIVE]) + _f32(0.125)  # inactive0
    out += _i64(-len(halves)) + halves  # raw-passthru ZIP form
    end2 = len(out)
    out[off2_at:off2_at + 24] = _i64(grid_pos) + _i64(grid_pos) + _i64(end2)
    return bytes(out)


def affine_fixture() -> bytes:
    """Single-grid file, version 222, compression NONE (data blocks are
    bare value streams, no int64 header), f32 buffers, AffineMap with a
    90-degree rotation + anisotropic scale + translation.  One leaf, two
    voxels."""
    out = bytearray()
    out += _i64(0x56444220)
    out += _u32(222)
    out += _u32(8) + _u32(1)
    out += bytes([1])
    out += _u32(0)  # compression NONE
    out += b"b" * 36
    out += _u32(0)  # no file metadata
    out += _u32(1)  # one grid
    out += _name(b"temp\x1e[0]") + _name(b"Tree_float_5_4_3") + bytes([0])
    off_at = len(out)
    out += _i64(0) * 3
    grid_pos = len(out)
    out += _u32(0)  # no grid metadata
    # Mat4d, row-major, row-vector convention: world = p_row * M with the
    # translation in the last row.
    m4 = [0.0, 1.0, 0.0, 0.0,
          -1.0, 0.0, 0.0, 0.0,
          0.0, 0.0, 2.0, 0.0,
          10.0, 20.0, 30.0, 1.0]
    out += _name(b"AffineMap") + struct.pack("<16d", *m4)
    out += _u32(1)
    out += _f32(0.0)
    out += _u32(0) + _u32(1)  # no tiles, one child
    out += _i32(0) * 3
    out += _bits(32768, [0]) + _bits(32768, [])
    out += bytes([META_NO_MASK_AND_ALL_VALS])
    out += np.zeros(32768, "<f4").tobytes()  # bare block: all upper values
    out += _bits(4096, [0]) + _bits(4096, [])
    out += bytes([META_NO_MASK_AND_ALL_VALS])
    out += np.zeros(4096, "<f4").tobytes()
    voxel_on = [7, 511]  # (0,0,7) and (7,7,7)
    out += _bits(512, voxel_on)
    out += _bits(512, voxel_on)
    vals = np.zeros(512, "<f4")
    vals[7] = 3.5
    vals[511] = -1.0
    out += bytes([META_NO_MASK_AND_ALL_VALS]) + vals.tobytes()
    end = len(out)
    out[off_at:off_at + 24] = _i64(grid_pos) + _i64(grid_pos) + _i64(end)
    return bytes(out)


def test_halfsink_fixture_parses_exactly(tmp_path):
    p = str(tmp_path / "halfsink.vdb")
    with open(p, "wb") as f:
        f.write(halfsink_fixture())
    data, bmin, mat, vec, name = V.read_vdb(p)
    assert name == "density"  # \x1e suffix stripped
    np.testing.assert_array_equal(bmin, [0, 0, 0])
    assert data.shape == (16, 8, 8)
    expect = np.zeros((16, 8, 8), np.float32)
    expect[0, 0, 0] = 1.5
    expect[1, 2, 3] = -2.25
    expect[8:16, 0:8, 0:8] = 0.25  # the active 8^3 value tile
    np.testing.assert_array_equal(data, expect)
    np.testing.assert_array_equal(mat, np.eye(3))  # TranslationMap
    np.testing.assert_array_equal(vec, [2.0, -3.0, 4.5])


def test_halfsink_fixture_grid_selection(tmp_path):
    p = str(tmp_path / "halfsink.vdb")
    with open(p, "wb") as f:
        f.write(halfsink_fixture())
    # selecting by the visible name must match the \x1e-suffixed grid
    *_, name = V.read_vdb(p, "density")
    assert name == "density"
    with pytest.raises(IOError):
        V.read_vdb(p, "flags")  # exists but is not a FloatGrid


def test_affine_fixture_parses_exactly(tmp_path):
    p = str(tmp_path / "affine.vdb")
    with open(p, "wb") as f:
        f.write(affine_fixture())
    data, bmin, mat, vec, name = V.read_vdb(p)
    assert name == "temp"
    np.testing.assert_array_equal(bmin, [0, 0, 7])
    assert data.shape == (8, 8, 1)
    assert data[0, 0, 0] == 3.5 and data[7, 7, 0] == -1.0
    assert np.count_nonzero(data) == 2
    # index->world in column-vector convention = transpose of the stored
    # row-vector Mat4's upper-left 3x3; translation from its last row.
    np.testing.assert_array_equal(
        mat, [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 2.0]])
    np.testing.assert_array_equal(vec, [10.0, 20.0, 30.0])


def test_fixture_truncation_sweep(tmp_path):
    """Every truncation of the hand-built fixture fails loudly (IOError),
    never crashes — covering the half/tile/multi-grid parse paths the
    writer-based truncation fuzz cannot reach."""
    blob = halfsink_fixture()
    p = str(tmp_path / "t.vdb")
    for cut in range(0, len(blob) - 1, 7):
        with open(p, "wb") as f:
            f.write(blob[:cut])
        with pytest.raises(IOError):
            V.read_vdb(p)


def test_wrong_codec_flags(tmp_path):
    """Adversarial codec-flag corpus: the declared compression must match
    the payload or the reader must raise, never misparse silently."""
    blob = bytearray(halfsink_fixture())
    comp_at = 8 + 4 + 8 + 1  # magic + version + libver + hasGridOffsets
    p = str(tmp_path / "c.vdb")

    def parse(mutated):
        with open(p, "wb") as f:
            f.write(bytes(mutated))
        return V.read_vdb(p)

    # declare BLOSC over zlib-compressed payloads
    blob[comp_at:comp_at + 4] = _u32(0x4 | 0x2)
    with pytest.raises(IOError):
        parse(blob)
    # declare NONE over framed (int64-headed) payloads
    blob[comp_at:comp_at + 4] = _u32(0x2)
    with pytest.raises(IOError):
        parse(blob)
    # bad magic
    blob = bytearray(halfsink_fixture())
    blob[0] ^= 0xFF
    with pytest.raises(IOError, match="magic"):
        parse(blob)
    # implausible metadata count
    blob = bytearray(halfsink_fixture())
    meta_count_at = comp_at + 4 + 36
    blob[meta_count_at:meta_count_at + 4] = _u32(0xFFFFFF)
    with pytest.raises(IOError):
        parse(blob)
    # skipped grid's end offset beyond EOF
    blob = bytearray(halfsink_fixture())
    off1_at = (meta_count_at + 4  # metadata count
               + (4 + 7) + (4 + 6) + 4 + 12  # the "creator" entry
               + 4  # grid count
               + (4 + 9) + (4 + 16) + 1)  # grid-1 descriptor
    stored = struct.unpack("<q", blob[off1_at + 16:off1_at + 24])[0]
    assert 0 < stored <= len(blob)  # offset arithmetic sanity
    blob[off1_at + 16:off1_at + 24] = _i64(len(blob) + 999)
    with pytest.raises(IOError):
        parse(blob)
    blob[off1_at + 16:off1_at + 24] = _i64(stored)
    parse(blob)  # restored blob must parse again (offset math is right)
