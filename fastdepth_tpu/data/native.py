"""ctypes bindings for the native preprocessing kernels (csrc/).

Falls back to numpy transparently when the shared library hasn't been
built — the numpy path is semantically identical (same gather indices),
just slower per item.  Build with ``make -C csrc``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "csrc", "libfdpreproc.so")
    return cand if os.path.exists(cand) else None


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    # ABI handshake: a stale locally-built .so (or one missing the version
    # symbol entirely) silently diverging from preprocess.cpp is worse than
    # the numpy fallback — refuse it.
    try:
        lib.fd_abi_version.restype = ctypes.c_int64
        if lib.fd_abi_version() != 2:
            return None
    except AttributeError:
        return None
    i64 = ctypes.c_int64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.fd_gather_rgb_f32.argtypes = [u8p, i64, i64, i64p, i64p, i64, i64, f32p]
    lib.fd_gather_depth_f32.argtypes = [f32p, i64, i64, i64p, i64p, i64, i64, f32p]
    lib.fd_chw_to_hwc_u8.argtypes = [u8p, i64, i64, u8p]
    for fn in (lib.fd_gather_rgb_f32, lib.fd_gather_depth_f32,
               lib.fd_chw_to_hwc_u8):
        fn.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def gather_rgb_f32(rgb: np.ndarray, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """uint8 HWC + index maps -> float32 HWC in [0, 1]."""
    lib = load_library()
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    if rgb.dtype != np.uint8:
        raise ValueError(
            f"gather_rgb_f32 takes raw uint8 HWC rgb, got {rgb.dtype} "
            "(a float buffer would be reinterpreted byte-wise by the C "
            "kernel)")
    if lib is None:
        return (rgb[rows][:, cols].astype(np.float32)) / 255.0
    rgb = np.ascontiguousarray(rgb)
    out = np.empty((len(rows), len(cols), 3), np.float32)
    lib.fd_gather_rgb_f32(
        _ptr(rgb, ctypes.c_uint8), rgb.shape[0], rgb.shape[1],
        _ptr(rows, ctypes.c_int64), _ptr(cols, ctypes.c_int64),
        len(rows), len(cols), _ptr(out, ctypes.c_float),
    )
    return out


def gather_depth_f32(depth: np.ndarray, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    lib = load_library()
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    depth = np.ascontiguousarray(depth, np.float32)
    if lib is None:
        return depth[rows][:, cols]
    out = np.empty((len(rows), len(cols)), np.float32)
    lib.fd_gather_depth_f32(
        _ptr(depth, ctypes.c_float), depth.shape[0], depth.shape[1],
        _ptr(rows, ctypes.c_int64), _ptr(cols, ctypes.c_int64),
        len(rows), len(cols), _ptr(out, ctypes.c_float),
    )
    return out


def chw_to_hwc_u8(chw: np.ndarray) -> np.ndarray:
    if chw.dtype != np.uint8:
        raise ValueError(f"chw_to_hwc_u8 takes uint8, got {chw.dtype}")
    lib = load_library()
    if lib is None:
        return np.transpose(chw, (1, 2, 0)).copy()
    chw = np.ascontiguousarray(chw)
    h, w = chw.shape[1], chw.shape[2]
    out = np.empty((h, w, 3), np.uint8)
    lib.fd_chw_to_hwc_u8(_ptr(chw, ctypes.c_uint8), h, w, _ptr(out, ctypes.c_uint8))
    return out
