"""ctypes bindings for the native C++ loader core (native/loader.cc):
threaded JPEG decode + bbox crop + bilinear resize producing fixed-size
uint8 RGB batches.

This is the framework's native replacement for the reference's
OpenCV-decode-inside-torch-DataLoader-workers host path
(reference: dataset/sbp_coco_dataset.py:42-51, :259-277).  The Python cv2
path remains as a fallback when the shared library has not been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "..", "native", "libppe_loader.so")

_lib: Optional[ctypes.CDLL] = None
try:
    if os.path.exists(_LIB_PATH):
        _lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        _lib.ppe_batch_decode_crop_resize.restype = ctypes.c_int
        _lib.ppe_batch_decode_crop_resize.argtypes = [
            ctypes.c_int,                      # n
            ctypes.POINTER(ctypes.c_uint8),    # blobs
            ctypes.POINTER(ctypes.c_int64),    # offsets
            ctypes.POINTER(ctypes.c_int),      # lens
            ctypes.POINTER(ctypes.c_int),      # boxes
            ctypes.c_int, ctypes.c_int,        # out_h, out_w
            ctypes.POINTER(ctypes.c_uint8),    # out
            ctypes.c_int,                      # n_threads
        ]
        _lib.ppe_decode_jpeg.restype = ctypes.c_int
        _lib.ppe_decode_jpeg.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
except OSError:  # pragma: no cover - load failure counts as unavailable
    _lib = None


def available() -> bool:
    return _lib is not None


def _as_u8_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_jpeg(blob: bytes, max_dim: int = 8192) -> np.ndarray:
    """Decode one JPEG blob to an RGB uint8 [H, W, 3] array."""
    assert _lib is not None, "native loader not built (make -C native)"
    buf = np.frombuffer(blob, np.uint8)
    out = np.empty(max_dim * max_dim * 3 // 16, np.uint8)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = _lib.ppe_decode_jpeg(_as_u8_ptr(buf), len(blob), _as_u8_ptr(out),
                              out.size, ctypes.byref(w), ctypes.byref(h))
    if rc == 2:  # output buffer too small: retry at full size
        out = np.empty(max_dim * max_dim * 3, np.uint8)
        rc = _lib.ppe_decode_jpeg(_as_u8_ptr(buf), len(blob),
                                  _as_u8_ptr(out), out.size,
                                  ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise RuntimeError(f"JPEG decode failed (rc={rc})")
    return out[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def batch_decode_crop_resize(blobs: Sequence[bytes],
                             boxes: Sequence[Tuple[int, int, int, int]],
                             out_h: int, out_w: int,
                             n_threads: int = 4) -> np.ndarray:
    """Decode + crop + resize a batch.  boxes are (x1, y1, w, h) with the
    reference's inclusive crop semantics (img[y1:y1+h+1, x1:x1+w+1],
    reference: dataset/sbp_coco_dataset.py:45-51); w < 0 selects the whole
    image.  Returns uint8 [N, out_h, out_w, 3]; raises on decode failure."""
    assert _lib is not None, "native loader not built (make -C native)"
    n = len(blobs)
    lens = np.asarray([len(b) for b in blobs], np.int32)
    offsets = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    concat = np.frombuffer(b"".join(blobs), np.uint8)
    boxes_arr = np.asarray(boxes, np.int32).reshape(n * 4)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    failed = _lib.ppe_batch_decode_crop_resize(
        n, _as_u8_ptr(concat),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        boxes_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(out_h), int(out_w), _as_u8_ptr(out), int(n_threads))
    if failed:
        raise RuntimeError(f"native loader: {failed}/{n} samples failed "
                           "to decode")
    return out
