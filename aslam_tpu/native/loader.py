"""ctypes binding for the native PNG decoder / dataset prefetcher.

Gracefully degrades: `decode_png` returns None when the shared library has
not been built, and callers fall back to Python decoders
(aslam_tpu/utils/dataset.py).  Build with `python -m aslam_tpu.native.build`.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libaslam_native.so")


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.aslam_decode_png.restype = ctypes.c_int
    lib.aslam_decode_png.argtypes = [
        ctypes.c_char_p,                  # path
        ctypes.POINTER(ctypes.c_int),     # out width
        ctypes.POINTER(ctypes.c_int),     # out height
        ctypes.POINTER(ctypes.c_int),     # out channels
        ctypes.POINTER(ctypes.c_int),     # out bit depth
        ctypes.POINTER(ctypes.c_void_p),  # out buffer (malloc'd)
    ]
    lib.aslam_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_png(path: str):
    """Decode a PNG via the native library.  Returns an ndarray
    (uint8 [H,W,C] / [H,W] or uint16 [H,W]) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bits = ctypes.c_int()
    buf = ctypes.c_void_p()
    rc = lib.aslam_decode_png(
        path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
        ctypes.byref(bits), ctypes.byref(buf),
    )
    if rc != 0 or not buf.value:
        return None
    try:
        n = w.value * h.value * c.value
        if bits.value == 16:
            arr = np.ctypeslib.as_array(
                ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint16)), (n,)
            ).copy()
        else:
            arr = np.ctypeslib.as_array(
                ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)), (n,)
            ).copy()
    finally:
        lib.aslam_free(buf)
    if c.value == 1:
        return arr.reshape(h.value, w.value)
    return arr.reshape(h.value, w.value, c.value)
