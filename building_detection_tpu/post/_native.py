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
_lib.bd_morph.restype = ctypes.c_int
_lib.bd_morph.argtypes = [
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_uint8),
]
_lib.bd_process_mask.restype = ctypes.c_int
_lib.bd_process_mask.argtypes = [
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_double,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_double,
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_uint8),
]


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


def _morph(img: np.ndarray, kernel, iterations: int, is_dilate: bool) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape
    out = np.empty((h, w), np.uint8)
    rc = _lib.bd_morph(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        int(kernel[0]),
        int(kernel[1]),
        int(iterations),
        1 if is_dilate else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError("bd_morph failed")
    return out


def erode(img: np.ndarray, kernel, iterations: int = 1) -> np.ndarray:
    return _morph(img, kernel, iterations, is_dilate=False)


def dilate(img: np.ndarray, kernel, iterations: int = 1) -> np.ndarray:
    return _morph(img, kernel, iterations, is_dilate=True)


def process_mask(
    mask: np.ndarray,
    min_area: float,
    split_kernel: int,
    split_iterations: int,
    fragment_min_area: float,
    do_split: bool = True,
) -> np.ndarray:
    """Fusion per-mask morphology; {0,255} out (see bd_process_mask)."""
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    out = np.empty((h, w), np.uint8)
    rc = _lib.bd_process_mask(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        float(min_area),
        int(split_kernel),
        int(split_iterations),
        float(fragment_min_area),
        1 if do_split else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError("bd_process_mask failed")
    return out
