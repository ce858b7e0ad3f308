"""ctypes loader for the C++ geometry fast path (native/src/geometry.cc).

Importing this module raises if the shared library is unavailable and cannot
be built; :mod:`building_detection_tpu.post.geometry` catches that and uses
its NumPy/scipy fallback.  Build explicitly with ``make -C native`` or let
this module compile on first import (g++ is part of the toolchain).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.normpath(os.path.join(_HERE, "..", "..", "native"))
_SRC = os.path.join(_NATIVE_DIR, "src", "geometry.cc")
_SO = os.path.join(_NATIVE_DIR, "build", "libbdgeometry.so")


def _build() -> None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)  # atomic: concurrent builders race safely


if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
    _build()

_lib = ctypes.CDLL(_SO)
_lib.bd_fill_holes.restype = ctypes.c_int
_lib.bd_fill_holes.argtypes = [
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_int,
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_uint8),
]
_lib.bd_find_contours.restype = ctypes.c_int
_lib.bd_find_contours.argtypes = [
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_int,
    ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
]
_lib.bd_free.restype = None
_lib.bd_free.argtypes = [ctypes.c_void_p]


def fill_holes(mask: np.ndarray) -> np.ndarray:
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    out = np.empty((h, w), np.uint8)
    rc = _lib.bd_fill_holes(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError("bd_fill_holes failed")
    return out


def find_contours(mask: np.ndarray) -> List[np.ndarray]:
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    pts_p = ctypes.POINTER(ctypes.c_int32)()
    off_p = ctypes.POINTER(ctypes.c_int32)()
    n = _lib.bd_find_contours(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        ctypes.byref(pts_p),
        ctypes.byref(off_p),
    )
    if n < 0:
        raise RuntimeError("bd_find_contours failed")
    try:
        offsets = np.ctypeslib.as_array(off_p, shape=(n + 1,)).copy()
        total = int(offsets[-1])
        if total:
            flat = np.ctypeslib.as_array(pts_p, shape=(total * 2,)).copy()
        else:
            flat = np.zeros((0,), np.int32)
    finally:
        _lib.bd_free(ctypes.cast(pts_p, ctypes.c_void_p))
        _lib.bd_free(ctypes.cast(off_p, ctypes.c_void_p))
    pts = flat.reshape(-1, 2)
    return [pts[offsets[i] : offsets[i + 1]] for i in range(n)]
