"""Volume ingestion front-end — file -> DenseGrid in HBM.

Reference flow (src/main.cpp:1157-1215): .vdb -> first FloatGrid ->
nanovdb::createNanoGrid -> staging buffer -> device SSBO.  TPU-native flow:
sparse file -> native parse (grid/vdbio_native.py, C++) -> dense bricked
array -> jnp.asarray (HBM upload).  Export to .nvdb is also supported (the
reverse of ingestion, createNanoGrid equivalent).
"""

from __future__ import annotations

import numpy as np

from .dense import DenseGrid, from_dense


def load(path: str, grid_index: int = 0) -> DenseGrid:
    """Load a volume file into a DenseGrid.  Formats: .nvdb (NanoVDB),
    .npy/.npz (dense arrays saved by this package)."""
    lower = path.lower()
    if lower.endswith(".nvdb"):
        return from_nvdb(path, grid_index)
    if lower.endswith(".vdb"):
        return from_vdb(path)
    if lower.endswith(".npy"):
        return from_dense(np.load(path))
    if lower.endswith(".npz"):
        z = np.load(path)
        return from_dense(
            z["voxels"],
            bbox_min=z["bbox_min"],
            map_mat=z["map_mat"],
            translation=z["map_vec"],
        )
    raise ValueError(
        f"unsupported volume format: {path} (.vdb/.nvdb/.npy/.npz)"
    )


def from_vdb(path: str, grid_name: str | None = None) -> DenseGrid:
    """Read an OpenVDB .vdb file (native reader subset: modern file
    versions, FloatGrid 5-4-3, none/zip/blosc codecs)."""
    from . import vdbio_native

    dense, bbox_min, mat, vec, _name = vdbio_native.read_vdb(path, grid_name)
    return from_dense(
        dense, bbox_min=bbox_min, map_mat=mat.astype(np.float32),
        translation=vec,
    )


def from_nvdb(path: str, grid_index: int = 0) -> DenseGrid:
    """Read a NanoVDB .nvdb file via the native parser."""
    from . import vdbio_native

    dense, bbox_min, mat, vec, _name = vdbio_native.read_nvdb(path, grid_index)
    return from_dense(
        dense, bbox_min=bbox_min, map_mat=mat.astype(np.float32),
        translation=vec,
    )


def from_nanovdb_blob(blob: bytes) -> DenseGrid:
    """Ingest an in-memory NanoVDB grid blob (the byte payload the reference
    uploads to its SSBO, src/main.cpp:1197-1212)."""
    from . import vdbio_native

    dense, bbox_min, mat, vec = vdbio_native.dense_from_blob(blob)
    return from_dense(
        dense, bbox_min=bbox_min, map_mat=mat.astype(np.float32),
        translation=vec,
    )


def save_nvdb(grid: DenseGrid, path: str, grid_name: str = "density",
              codec: str = "zip") -> None:
    """Export a DenseGrid as a .nvdb file (createNanoGrid equivalent)."""
    from . import vdbio_native

    vdbio_native.write_nvdb(
        path,
        np.asarray(grid.voxels),
        bbox_min=np.asarray(grid.bbox_min),
        mat=np.asarray(grid.map_mat, np.float64),
        vec=np.asarray(grid.map_vec, np.float64),
        grid_name=grid_name,
        codec=codec,
    )


def save_vdb(grid: DenseGrid, path: str, grid_name: str = "density",
             compression: str = "zip+mask") -> None:
    """Export a DenseGrid as an OpenVDB .vdb file (native/vdb_write.cpp).

    ``compression``: "none" | "zip" | "zip+mask" | "blosc" | "blosc+mask".
    NOTE: exports the padded voxel array (grid.voxels is brick-padded);
    zero padding voxels are inactive, so a reload reconstructs the same
    active set."""
    from . import vdbio_native

    vdbio_native.write_vdb(
        path,
        (
            np.asarray(grid.voxels),
            np.asarray(grid.bbox_min),
            np.asarray(grid.map_mat, np.float64),
            np.asarray(grid.map_vec, np.float64),
            grid_name,
        ),
        compression,
    )


def save_npz(grid: DenseGrid, path: str) -> None:
    np.savez_compressed(
        path,
        voxels=np.asarray(grid.voxels),
        bbox_min=np.asarray(grid.bbox_min),
        map_mat=np.asarray(grid.map_mat),
        map_vec=np.asarray(grid.map_vec),
    )
