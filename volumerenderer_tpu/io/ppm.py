"""PPM/PNG image output — parity with CPU_test's writer (CPU_test/main.cpp:128-132)."""

from __future__ import annotations

import numpy as np


def write_ppm(path: str, image_u8: np.ndarray) -> None:
    """Binary P6 PPM. ``image_u8``: (H, W, 3) or (H, W) uint8."""
    img = np.asarray(image_u8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8, got {img.dtype}")
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img[..., :3].tobytes())


def read_ppm(path: str) -> np.ndarray:
    """Read binary P6 PPM -> (H, W, 3) uint8."""
    with open(path, "rb") as f:
        data = f.read()
    # Header: magic, dims, maxval, separated by whitespace (no comments
    # support needed for our own files).
    parts = data.split(maxsplit=4)
    if parts[0] != b"P6":
        raise ValueError("not a P6 PPM")
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    raw = parts[4][: w * h * 3]
    return np.frombuffer(raw, np.uint8).reshape(h, w, 3)


def write_png(path: str, image_u8: np.ndarray) -> None:
    from PIL import Image

    img = np.asarray(image_u8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    Image.fromarray(img).save(path)
