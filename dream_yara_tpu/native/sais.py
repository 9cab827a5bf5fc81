"""ctypes binding for the C++ SA-IS engine (sais.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from .build import build

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = build("libdysais.so")
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.dy_sais_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.dy_sais_u8.restype = ctypes.c_int32
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def suffix_array(text: np.ndarray) -> np.ndarray:
    """O(n) suffix array of an int8/uint8 code array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native SA-IS library unavailable")
    t = np.ascontiguousarray(text, dtype=np.uint8)
    n = len(t)
    sa = np.empty(n, dtype=np.int32)
    if n:
        lib.dy_sais_u8(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int32(n))
    return sa
