"""ctypes bindings for the native collate/normalize stage (native/collate.cpp)
with a vectorised numpy fallback.

Converts uint8 image batches to normalized float32 in one fused multithreaded
pass: dst = u8 * scale[c] + shift[c]. Used by the data pipeline for both the
[0,1] triplet images and ImageNet-normalised detection images (the
reference's equivalent work happens inside cv2/torch native ops,
data/dataset.py:40-160).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LIB_LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        native_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "native")
        lib_path = os.path.join(native_dir, "libcollate.so")
        if not os.path.exists(lib_path):
            try:
                subprocess.run(["make", "-C", native_dir, "libcollate.so"],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(lib_path)
            lib.normalize_u8_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32,
            ]
            lib.normalize_u8_batch.restype = None
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def normalize_u8(images: np.ndarray, mean=None, std=None,
                 n_threads: int = 4) -> np.ndarray:
    """uint8 (..., H, W, C) -> float32 ((x/255) - mean) / std.

    mean/std: per-channel (default: plain [0,1] conversion). Native fused
    pass when libcollate builds; numpy otherwise (same numerics: both go
    through a float32 LUT of the 256 possible byte values)."""
    assert images.dtype == np.uint8
    c = images.shape[-1]
    mean = np.zeros(c, np.float32) if mean is None else np.asarray(mean, np.float32)
    std = np.ones(c, np.float32) if std is None else np.asarray(std, np.float32)
    scale = (1.0 / (255.0 * std)).astype(np.float32)
    shift = (-mean / std).astype(np.float32)

    lib = _load_lib()
    flat = np.ascontiguousarray(images)
    if lib is not None and flat.ndim >= 3:
        n_images = int(np.prod(flat.shape[:-3], dtype=np.int64))
        pixels = int(np.prod(flat.shape[-3:-1]))
        dst = np.empty(flat.shape, np.float32)
        lib.normalize_u8_batch(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_images, pixels, c,
            scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            shift.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_threads)
        return dst
    # numpy fallback via the same LUT construction
    lut = (np.arange(256, dtype=np.float32)[None, :] * scale[:, None]
           + shift[:, None])  # (C, 256)
    out = np.empty(flat.shape, np.float32)
    for ch in range(c):
        out[..., ch] = lut[ch][flat[..., ch]]
    return out
