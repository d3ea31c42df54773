"""ctypes binding for the native (C++) metrics core, with lazy compilation.

``native/edt.cpp`` implements exact EDT + HD95 (the per-case evaluation hot
path). The library is compiled on first use with the system g++ into the
repo's build dir; any failure (no compiler, load error) degrades silently to
the scipy path in ``cswin_unet_tpu.metrics``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "edt.cpp")
_LIB = os.path.join(_REPO, "native", "build", "libedt.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            os.makedirs(os.path.dirname(_LIB), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB)
        lib.hd95.restype = ctypes.c_double
        lib.hd95.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.edt_sq.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u8_3d(mask: np.ndarray) -> tuple[np.ndarray, int, int, int, int]:
    m = np.ascontiguousarray(mask.astype(np.uint8))
    if m.ndim == 2:
        return m[None], 1, m.shape[0], m.shape[1], 1
    assert m.ndim == 3, m.shape
    return m, m.shape[0], m.shape[1], m.shape[2], 0


def hd95_native(pred: np.ndarray, gt: np.ndarray) -> float | None:
    """Native HD95, or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    a, d, h, w, is2d = _as_u8_3d(pred)
    b, _, _, _, _ = _as_u8_3d(gt)
    val = lib.hd95(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        d, h, w, is2d,
    )
    return None if val < 0 else float(val)


def edt_native(mask: np.ndarray) -> np.ndarray | None:
    """Exact euclidean distance to the nearest nonzero voxel, or None."""
    lib = _load()
    if lib is None:
        return None
    m, d, h, w, _ = _as_u8_3d(mask)
    out = np.empty((d, h, w), np.float64)
    lib.edt_sq(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        d, h, w,
    )
    out = np.sqrt(out)
    return out[0] if mask.ndim == 2 else out
