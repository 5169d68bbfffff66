"""ctypes bindings for the native host kernels (native/ocm_native.cpp).

Loads (and, if needed, builds) libocm_native.so. Every function has the same
semantics as the scipy-based fallbacks in ops/morphology.py; the ops layer
picks the native path automatically when the library is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libocm_native.so")

_lib = None


def _build():
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)


def load(build_if_missing: bool = True):
    """Returns the loaded library or None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "ocm_native.cpp")
    stale = (
        os.path.exists(_LIB_PATH)
        and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if (not os.path.exists(_LIB_PATH) or stale) and build_if_missing:
        try:
            _build()  # Makefile no-ops when the target is fresh
        except Exception:
            if stale:
                return None  # never load a binary older than its source
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # a stale/foreign-arch .so (e.g. built with -march=native elsewhere)
        # must degrade to the scipy fallback, not crash the ops dispatch
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.cc_label.restype = ctypes.c_int32
    lib.cc_label.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.remove_small_objects.restype = ctypes.c_int32
    lib.remove_small_objects.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8p]
    lib.binary_dilation.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32, u8p, ctypes.c_int32, ctypes.c_int32, u8p]
    lib.binary_erosion.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32, u8p, ctypes.c_int32, ctypes.c_int32,
                                   ctypes.c_uint8, u8p]
    lib.region_props.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i64p, f64p, i32p]
    lib.histogram_u8.argtypes = [u8p, ctypes.c_int64, i64p]
    lib.otsu_threshold.restype = ctypes.c_double
    lib.otsu_threshold.argtypes = [u8p, ctypes.c_int64]
    _lib = lib
    return lib


def _u8(a):
    return np.ascontiguousarray(a, dtype=np.uint8)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def available() -> bool:
    return load() is not None


def _lib_or_raise():
    lib = load()
    if lib is None:
        raise RuntimeError(
            "native library unavailable (build failed or .so unloadable); "
            "gate calls with native.available() or use the scipy fallbacks "
            "in ops/morphology.py")
    return lib


def _check_symmetric_odd_se(se: np.ndarray):
    """The C++ morphology implements correlation with the SE as-is; scipy
    mirrors the structure and shifts origins for even sizes. For symmetric
    odd-sized SEs (every caller here: disk()) the two coincide exactly —
    enforce that instead of silently diverging for exotic SEs."""
    if se.shape[0] % 2 == 0 or se.shape[1] % 2 == 0 or not np.array_equal(se, se[::-1, ::-1]):
        raise ValueError(
            "native morphology requires a symmetric, odd-sized structuring "
            "element (scipy mirrors the SE; the native kernel does not) — "
            "use the scipy fallback for this SE")


def cc_label(mask: np.ndarray):
    """(labels int32, n): 8-connected components in first-encounter order."""
    lib = _lib_or_raise()
    m = _u8(mask != 0)
    h, w = m.shape
    labels = np.empty((h, w), np.int32)
    n = lib.cc_label(_ptr(m, ctypes.c_uint8), h, w, _ptr(labels, ctypes.c_int32))
    return labels, int(n)


def remove_small_objects(mask: np.ndarray, min_size: int = 20) -> np.ndarray:
    lib = _lib_or_raise()
    m = _u8(mask != 0)
    h, w = m.shape
    out = np.empty((h, w), np.uint8)
    lib.remove_small_objects(_ptr(m, ctypes.c_uint8), h, w, min_size, _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def binary_dilation(mask: np.ndarray, se: np.ndarray) -> np.ndarray:
    lib = _lib_or_raise()
    _check_symmetric_odd_se(np.asarray(se) != 0)
    m, s = _u8(mask != 0), _u8(se != 0)
    h, w = m.shape
    out = np.empty((h, w), np.uint8)
    lib.binary_dilation(_ptr(m, ctypes.c_uint8), h, w, _ptr(s, ctypes.c_uint8), s.shape[0], s.shape[1],
                        _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def binary_erosion(mask: np.ndarray, se: np.ndarray, border_value: int = 0) -> np.ndarray:
    lib = _lib_or_raise()
    _check_symmetric_odd_se(np.asarray(se) != 0)
    m, s = _u8(mask != 0), _u8(se != 0)
    h, w = m.shape
    out = np.empty((h, w), np.uint8)
    lib.binary_erosion(_ptr(m, ctypes.c_uint8), h, w, _ptr(s, ctypes.c_uint8), s.shape[0], s.shape[1],
                       border_value, _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def region_props(labels: np.ndarray, n: int):
    """(areas int64 (n,), centroids float64 (n,2) as (x,y), bbox int32 (n,4))."""
    lib = _lib_or_raise()
    lab = np.ascontiguousarray(labels, np.int32)
    h, w = lab.shape
    areas = np.empty(n, np.int64)
    centroids = np.empty((n, 2), np.float64)
    bbox = np.empty((n, 4), np.int32)
    lib.region_props(_ptr(lab, ctypes.c_int32), h, w, n, _ptr(areas, ctypes.c_int64),
                     _ptr(centroids, ctypes.c_double), _ptr(bbox, ctypes.c_int32))
    return areas, centroids, bbox


def otsu_threshold(img_u8: np.ndarray) -> float:
    lib = _lib_or_raise()
    a = _u8(img_u8)
    if a.size == 0:
        return 0.0  # cv2 convention for empty input; avoids NaN histograms
    return float(lib.otsu_threshold(_ptr(a, ctypes.c_uint8), a.size))
