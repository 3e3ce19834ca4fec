"""ctypes bindings for the native ingestion library (native/vdbio.cpp).

Compiles the C++ on first use (cached next to the source); the build is a
single translation unit linking only zlib.  The reference does its
ingestion in C++ against the OpenVDB/NanoVDB stack (src/main.cpp:1157-1215);
this is the dependency-free TPU-build equivalent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libvdbio.so"))
_SRCS = [
    os.path.abspath(os.path.join(_NATIVE_DIR, f))
    for f in ("vdbio.cpp", "vdb_read.cpp", "vdb_write.cpp", "imageio.cpp")
]
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17", *_SRCS,
        "-o", _SO_PATH, "-lz",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) or any(
            os.path.getmtime(_SO_PATH) < os.path.getmtime(s) for s in _SRCS
        ):
            _build()
        L = ctypes.CDLL(_SO_PATH)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_f32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
        c_u8pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_dp = ctypes.POINTER(ctypes.c_double)
        L.vdbio_read_nvdb.argtypes = [
            ctypes.c_char_p, ctypes.c_int, c_f32pp, c_i64p, c_i32p, c_dp,
            c_dp, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        L.vdbio_dense_from_blob.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, c_f32pp, c_i64p, c_i32p, c_dp,
            c_dp, ctypes.c_char_p, ctypes.c_int,
        ]
        L.vdbio_write_nvdb.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, c_i32p, c_dp, c_dp,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        L.vdbio_blob_from_dense.argtypes = [
            ctypes.c_void_p, c_i32p, c_dp, c_dp, ctypes.c_char_p, c_u8pp,
            c_i64p,
        ]
        L.vdbio_read_vdb.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, c_f32pp, c_i64p, c_i32p, c_dp,
            c_dp, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        L.vdbio_write_vdb.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), c_i64p, c_i32p,
            c_dp, c_dp, ctypes.POINTER(ctypes.c_char_p), ctypes.c_uint32,
            ctypes.c_char_p, ctypes.c_int,
        ]
        L.vdbio_free.argtypes = [ctypes.c_void_p]
        _lib = L
        return L


def _unpack_dense(data_p, n, bbox, mat, vec):
    nx = bbox[3] - bbox[0] + 1
    ny = bbox[4] - bbox[1] + 1
    nz = bbox[5] - bbox[2] + 1
    assert nx * ny * nz == n.value, (nx, ny, nz, n.value)
    arr = np.ctypeslib.as_array(data_p, shape=(n.value,)).reshape(nx, ny, nz)
    out = np.array(arr, np.float32)  # copy before freeing
    lib().vdbio_free(data_p)
    return (
        out,
        np.array(bbox[:3], np.int32),
        np.array(mat[:9], np.float64).reshape(3, 3),
        np.array(vec[:3], np.float64),
    )


def read_nvdb(path: str, grid_index: int = 0):
    """Read a .nvdb file -> (dense (nx,ny,nz) f32, bbox_min, mat, vec, name)."""
    L = lib()
    data_p = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    bbox = (ctypes.c_int32 * 6)()
    mat = (ctypes.c_double * 9)()
    vec = (ctypes.c_double * 3)()
    name = ctypes.create_string_buffer(256)
    err = ctypes.create_string_buffer(512)
    rc = L.vdbio_read_nvdb(
        path.encode(), grid_index, ctypes.byref(data_p), ctypes.byref(n),
        bbox, mat, vec, name, 256, err, 512,
    )
    if rc:
        raise IOError(f"read_nvdb({path}): {err.value.decode()}")
    dense, bmin, m, v = _unpack_dense(data_p, n, bbox, mat, vec)
    return dense, bmin, m, v, name.value.decode()


def read_vdb(path: str, grid_name: str | None = None):
    """Read an OpenVDB .vdb file (native/vdb_read.cpp subset) ->
    (dense (nx,ny,nz) f32, bbox_min, mat, vec, name).  ``grid_name``: pick a
    specific grid; None takes the first FloatGrid (matching the reference's
    search, src/main.cpp:1173-1181)."""
    L = lib()
    data_p = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    bbox = (ctypes.c_int32 * 6)()
    mat = (ctypes.c_double * 9)()
    vec = (ctypes.c_double * 3)()
    name = ctypes.create_string_buffer(256)
    err = ctypes.create_string_buffer(512)
    rc = L.vdbio_read_vdb(
        path.encode(), (grid_name or "").encode(), ctypes.byref(data_p),
        ctypes.byref(n), bbox, mat, vec, name, 256, err, 512,
    )
    if rc:
        raise IOError(f"read_vdb({path}): {err.value.decode()}")
    dense, bmin, m, v = _unpack_dense(data_p, n, bbox, mat, vec)
    return dense, bmin, m, v, name.value.decode()


def dense_from_blob(blob: bytes):
    """Parse an in-memory NanoVDB grid blob (the reference's SSBO payload)."""
    L = lib()
    data_p = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    bbox = (ctypes.c_int32 * 6)()
    mat = (ctypes.c_double * 9)()
    vec = (ctypes.c_double * 3)()
    err = ctypes.create_string_buffer(512)
    rc = L.vdbio_dense_from_blob(
        blob, len(blob), ctypes.byref(data_p), ctypes.byref(n), bbox, mat,
        vec, err, 512,
    )
    if rc:
        raise IOError(f"dense_from_blob: {err.value.decode()}")
    return _unpack_dense(data_p, n, bbox, mat, vec)


def write_nvdb(
    path: str,
    dense: np.ndarray,
    bbox_min=(0, 0, 0),
    mat=None,
    vec=(0.0, 0.0, 0.0),
    grid_name: str = "density",
    codec: str = "zip",
) -> None:
    """Write a dense array as a single-grid .nvdb file (float fog volume)."""
    L = lib()
    dense = np.ascontiguousarray(dense, np.float32)
    bbox = (ctypes.c_int32 * 6)(
        *[int(b) for b in bbox_min],
        *[int(bbox_min[i]) + dense.shape[i] - 1 for i in range(3)],
    )
    if mat is None:
        mat = np.eye(3)
    m = (ctypes.c_double * 9)(*np.asarray(mat, np.float64).reshape(-1))
    v = (ctypes.c_double * 3)(*np.asarray(vec, np.float64))
    err = ctypes.create_string_buffer(512)
    codec_id = {"none": 0, "zip": 1}[codec]
    rc = L.vdbio_write_nvdb(
        path.encode(), dense.ctypes.data_as(ctypes.c_void_p), bbox, m, v,
        grid_name.encode(), codec_id, err, 512,
    )
    if rc:
        raise IOError(f"write_nvdb({path}): {err.value.decode()}")


def write_vdb(
    path: str,
    grids,
    compression: str = "zip+mask",
) -> None:
    """Write an OpenVDB ``.vdb`` file (native/vdb_write.cpp — the
    framework's VDB export, and the independent second encoder the reader
    is cross-checked against).

    ``grids``: either a single tuple or a list of tuples
    ``(dense (nx,ny,nz) f32, bbox_min, mat 3x3 | None, vec, name)`` —
    multiple tuples produce a multi-grid file.
    ``compression``: "none" | "zip" | "zip+mask" | "blosc" | "blosc+mask",
    each optionally with "+half" (saveFloatAsHalf: value buffers narrowed
    to binary16 like the reference's OpenVDB export option).
    """
    L = lib()
    if isinstance(grids, tuple):
        grids = [grids]
    flags = 0
    if "zip" in compression:
        flags |= 1
    if "mask" in compression:
        flags |= 2
    if "blosc" in compression:
        flags |= 4
    if "half" in compression:
        flags |= 8
    n = len(grids)
    keep = []  # keep contiguous arrays alive for the call
    datas = (ctypes.POINTER(ctypes.c_float) * n)()
    dims = (ctypes.c_int64 * (3 * n))()
    bmins = (ctypes.c_int32 * (3 * n))()
    mats = (ctypes.c_double * (9 * n))()
    vecs = (ctypes.c_double * (3 * n))()
    names = (ctypes.c_char_p * n)()
    for i, (dense, bbox_min, mat, vec, name) in enumerate(grids):
        dense = np.ascontiguousarray(dense, np.float32)
        keep.append(dense)
        datas[i] = dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        dims[3 * i: 3 * i + 3] = [int(s) for s in dense.shape]
        bmins[3 * i: 3 * i + 3] = [int(b) for b in bbox_min]
        m = np.eye(3) if mat is None else np.asarray(mat, np.float64)
        mats[9 * i: 9 * i + 9] = list(m.reshape(-1))
        vecs[3 * i: 3 * i + 3] = list(np.asarray(vec, np.float64))
        names[i] = name.encode()
    err = ctypes.create_string_buffer(512)
    rc = L.vdbio_write_vdb(path.encode(), n, datas, dims, bmins, mats, vecs,
                           names, flags, err, 512)
    if rc:
        raise IOError(f"write_vdb({path}): {err.value.decode()}")


def blob_from_dense(
    dense: np.ndarray, bbox_min=(0, 0, 0), mat=None, vec=(0.0, 0.0, 0.0),
    grid_name: str = "density",
) -> bytes:
    """Build an in-memory NanoVDB grid blob (createNanoGrid equivalent,
    src/main.cpp:1191)."""
    L = lib()
    dense = np.ascontiguousarray(dense, np.float32)
    bbox = (ctypes.c_int32 * 6)(
        *[int(b) for b in bbox_min],
        *[int(bbox_min[i]) + dense.shape[i] - 1 for i in range(3)],
    )
    if mat is None:
        mat = np.eye(3)
    m = (ctypes.c_double * 9)(*np.asarray(mat, np.float64).reshape(-1))
    v = (ctypes.c_double * 3)(*np.asarray(vec, np.float64))
    blob_p = ctypes.POINTER(ctypes.c_uint8)()
    n = ctypes.c_int64()
    L.vdbio_blob_from_dense(
        dense.ctypes.data_as(ctypes.c_void_p), bbox, m, v, grid_name.encode(),
        ctypes.byref(blob_p), ctypes.byref(n),
    )
    out = bytes(np.ctypeslib.as_array(blob_p, shape=(n.value,)))
    L.vdbio_free(blob_p)
    return out
