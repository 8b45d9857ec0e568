"""ctypes loader for the native C++ core (A* + marching tetrahedra).

Builds native/libisdf_native.so with make on first use if the toolchain is
available; all callers fall back to the pure-Python twins when the library
cannot be built (isdf_tpu/search/astar.py, isdf_tpu/viz/mc.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libisdf_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.isdf_astar_se3.restype = ctypes.c_int
    lib.isdf_astar_se3.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_long),
    ]
    lib.isdf_marching_tetrahedra.restype = ctypes.c_long
    lib.isdf_marching_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double), ctypes.c_long,
    ]
    _lib = lib
    return _lib


def astar_native(occ: np.ndarray, feas: Optional[np.ndarray],
                 start_idx, goal_idx, max_expansions: int = 2_000_000):
    """Returns (path_idx (L,3), pose_idx (L,2), expanded) or None on failure
    / unavailable library."""
    lib = get_lib()
    if lib is None:
        return None
    occ8 = np.ascontiguousarray(occ.astype(np.uint8))
    X, Y, Z = occ8.shape
    if feas is not None:
        feas8 = np.ascontiguousarray(feas.astype(np.uint8))
        R, P = feas8.shape[:2]
        fptr = feas8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    else:
        R = P = 0
        fptr = ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    max_len = X * Y * Z
    out_path = np.zeros((max_len, 3), dtype=np.int32)
    out_poses = np.zeros((max_len, 2), dtype=np.int32)
    expanded = ctypes.c_long(0)
    L = lib.isdf_astar_se3(
        occ8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), X, Y, Z,
        fptr, R, P,
        int(start_idx[0]), int(start_idx[1]), int(start_idx[2]),
        int(goal_idx[0]), int(goal_idx[1]), int(goal_idx[2]),
        max_expansions,
        out_path.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_poses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_len, ctypes.byref(expanded),
    )
    if L <= 0:
        return None if L < 0 else (None, None, expanded.value)
    return out_path[:L].copy(), out_poses[:L].copy(), expanded.value


def marching_tetrahedra(field: np.ndarray, origin, resolution: float,
                        iso: float = 0.0) -> Optional[np.ndarray]:
    """Triangle soup (T, 3, 3) of the iso-surface, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    f = np.ascontiguousarray(field.astype(np.float64))
    X, Y, Z = f.shape
    max_tris = max(4 * X * Y * Z, 1 << 16)
    out = np.zeros((max_tris, 9), dtype=np.float64)
    n = lib.isdf_marching_tetrahedra(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), X, Y, Z,
        float(origin[0]), float(origin[1]), float(origin[2]),
        float(resolution), float(iso),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_tris,
    )
    if n < 0:
        return None
    return out[:n].reshape(n, 3, 3)
