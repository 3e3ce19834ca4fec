"""Asynchronous frame export — the presentation pipeline equivalent.

The reference overlaps rendering and presentation with two frames in flight
and a swapchain (src/main.cpp:44, 892-933).  Headless TPU equivalent: the
device keeps rendering while a background thread encodes finished frames
with the native C++ encoder (native/imageio.cpp) and writes them to disk.
"""

from __future__ import annotations

import ctypes
import os
import queue
import threading

import numpy as np


def _encoder():
    from ..grid import vdbio_native

    L = vdbio_native.lib()
    for name in ("vdbio_write_png", "vdbio_write_ppm"):
        fn = getattr(L, name)
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_char_p, ctypes.c_int,
        ]
    return L


def write_image_native(path: str, image_u8: np.ndarray) -> None:
    """Synchronous native encode+write of an (H, W, 3) or (H, W) uint8
    image to .png or .ppm."""
    img = np.ascontiguousarray(image_u8)
    if img.ndim == 2:
        img = np.ascontiguousarray(np.repeat(img[..., None], 3, axis=-1))
    if img.dtype != np.uint8 or img.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    L = _encoder()
    err = ctypes.create_string_buffer(256)
    fn = (
        L.vdbio_write_ppm if path.lower().endswith(".ppm")
        else L.vdbio_write_png
    )
    rc = fn(path.encode(), img.ctypes.data_as(ctypes.c_void_p), w, h, err, 256)
    if rc:
        raise IOError(f"write_image_native({path}): {err.value.decode()}")


class AsyncFrameWriter:
    """Background-thread frame exporter; the render loop never blocks on
    encode/IO.  Use as a context manager:

        with AsyncFrameWriter() as fw:
            for i in range(n):
                renderer.step()
                fw.submit(f"frame_{i:04d}.png", renderer.image_u8())
    """

    def __init__(self, max_pending: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._errors: list[Exception] = []
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            path, img = item
            try:
                write_image_native(path, img)
            except Exception as e:  # surfaced on close()
                self._errors.append(e)
            finally:
                self._q.task_done()

    def submit(self, path: str, image_u8: np.ndarray) -> None:
        # Copy now: the caller may donate/overwrite the buffer next frame.
        self._q.put((path, np.array(image_u8)))

    def close(self) -> None:
        self._q.join()
        self._q.put(None)
        self._thread.join()
        if self._errors:
            raise self._errors[0]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
