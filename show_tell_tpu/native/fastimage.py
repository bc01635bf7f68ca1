"""ctypes binding for the native JPEG decode + resize library.

The native path replaces PIL decode + resize in the host input pipeline
(data/dataset.py uses it automatically when available); PIL remains the
fallback and the parity reference.  pybind11 is not in this toolchain,
so the C ABI + ctypes is the binding layer.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

from show_tell_tpu.native.build import LIB as _LIB_PATH  # ABI-versioned path

_lib = None
_lock = threading.Lock()
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH) and not _build_attempted:
            # The path is ABI-versioned (build.py), so an old library on
            # disk never satisfies this check — no rebuild-and-redlopen
            # dance (dlopen caches by path and would return the stale
            # handle).
            _build_attempted = True
            from show_tell_tpu.native.build import build

            build(verbose=False)
        if not os.path.isfile(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.st_decode_resize2.restype = ctypes.c_int
        lib.st_decode_resize2.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.st_decode_resize_batch2.restype = ctypes.c_int
        lib.st_decode_resize_batch2.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.st_decode_resize_batch3.restype = ctypes.c_int
        lib.st_decode_resize_batch3.argtypes = (
            lib.st_decode_resize_batch2.argtypes + [ctypes.c_int]
        )
        lib.st_s2d_relayout.restype = None
        lib.st_s2d_relayout.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def decode_resize(jpeg_bytes: bytes, out_h: int, out_w: int, fast_scale: bool = False) -> np.ndarray:
    """JPEG bytes -> uint8 RGB [out_h, out_w, 3]. Raises on decode error.

    ``fast_scale`` enables libjpeg's DCT-domain scaled decode (the IDCT
    emits the smallest M/8 reduction still covering the target, then the
    antialiased resize finishes the job) — several times faster on
    COCO-sized images, pixels within a few LSB of the full-resolution
    path (tests/test_native.py pins the bound). Off = PIL-parity.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastimage unavailable (build failed?)")
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    rc = lib.st_decode_resize2(
        jpeg_bytes,
        len(jpeg_bytes),
        out_h,
        out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        1 if fast_scale else 0,
    )
    if rc != 0:
        raise ValueError("JPEG decode failed (status %d)" % rc)
    return out


def decode_resize_batch(
    jpeg_buffers: Sequence[bytes],
    out_h: int,
    out_w: int,
    n_threads: int = 0,
    fast_scale: bool = False,
    s2d: bool = False,
) -> Tuple[np.ndarray, List[int]]:
    """Threaded batch decode. Returns (uint8 [N, H, W, 3], statuses).

    ``s2d`` emits the space-to-depth serving layout instead —
    [N, H/2, W/2, 12] with the (di, dj, c) channel order of
    ops/s2d_stem.py (same bytes; the TPU stem then needs no device-side
    relayout — data/transforms.preprocess_images_s2d)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastimage unavailable (build failed?)")
    n = len(jpeg_buffers)
    shape = (n, out_h // 2, out_w // 2, 12) if s2d else (n, out_h, out_w, 3)
    out = np.empty(shape, dtype=np.uint8)
    statuses = (ctypes.c_int * n)()
    bufs = (ctypes.c_char_p * n)(*jpeg_buffers)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in jpeg_buffers])
    if n_threads <= 0:
        n_threads = min(max(os.cpu_count() or 1, 1), max(n, 1))
    lib.st_decode_resize_batch3(
        bufs,
        lens,
        n,
        out_h,
        out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        statuses,
        n_threads,
        1 if fast_scale else 0,
        1 if s2d else 0,
    )
    return out, list(statuses)


def s2d_relayout(rgb: np.ndarray) -> np.ndarray:
    """uint8 [H, W, 3] -> [H/2, W/2, 12] via the native relayout."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastimage unavailable (build failed?)")
    h, w, _ = rgb.shape
    rgb = np.ascontiguousarray(rgb)
    out = np.empty((h // 2, w // 2, 12), dtype=np.uint8)
    lib.st_s2d_relayout(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
