"""ctypes bindings for the native host kernels (native/velodyne.cpp).

Compiled on demand with g++ into ``native/_ssde_native.so`` (cached); every
entry point has a numpy fallback so the framework runs without a C++
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "velodyne.cpp")
_SO = os.path.join(_NATIVE_DIR, "_ssde_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        try:  # retry without -march=native (portability)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
            return True
        except Exception:
            return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.project_velodyne.restype = ctypes.c_int64
        lib.project_velodyne.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.box_downsample_2x.restype = None
        lib.box_downsample_2x.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def project_velodyne_native(points: np.ndarray, P: np.ndarray,
                            height: int, width: int,
                            vel_depth: bool = False):
    """C++ projection; returns None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    Pm = np.ascontiguousarray(P, dtype=np.float64).reshape(-1)
    out = np.zeros((height, width), dtype=np.float32)
    lib.project_velodyne(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        Pm.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int32(height), ctypes.c_int32(width),
        ctypes.c_int32(1 if vel_depth else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
