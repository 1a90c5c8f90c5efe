"""ctypes bindings for the native C++ A* / BFS (swarm_ode_tpu/native/).

Drop-in host-path equivalent of pyastar2d (the reference's only native
dependency, warehouse.py:308): `astar_path(weights, start, goal,
allow_diagonal)` with identical call semantics — float32 weight grid,
inf-blocked cells, path returned including the start cell, None when
unreachable. Builds the shared object on first use (cached).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libswarm_native.so")
_lib = None


def _needs_build() -> bool:
    """Rebuild when the binary is missing OR any native source is newer than
    it (a committed stale .so must never shadow an edited astar.cpp)."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for name in os.listdir(_NATIVE_DIR):
        if name.endswith((".cpp", ".cc", ".h", ".hpp")) or name == "Makefile":
            if os.path.getmtime(os.path.join(_NATIVE_DIR, name)) > lib_mtime:
                return True
    return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _needs_build():
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.astar_path_c.restype = ctypes.c_int32
    lib.astar_path_c.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bfs_fields_c.restype = None
    lib.bfs_fields_c.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def astar_path(
    weights: np.ndarray,
    start,
    goal,
    allow_diagonal: bool = False,
) -> Optional[np.ndarray]:
    """A* over a float32 cost grid. Returns (L, 2) array of (y, x) incl.
    start, or None if no path exists (pyastar2d-compatible)."""
    lib = _load()
    w = np.ascontiguousarray(weights, dtype=np.float32)
    h, ww = w.shape
    start_i = int(start[0]) * ww + int(start[1])
    goal_i = int(goal[0]) * ww + int(goal[1])
    out = np.empty(h * ww, dtype=np.int32)
    n = lib.astar_path_c(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h,
        ww,
        start_i,
        goal_i,
        1 if allow_diagonal else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n == 0:
        return None
    flat = out[:n]
    return np.stack([flat // ww, flat % ww], axis=1)


def bfs_fields(passable: np.ndarray, targets_yx: np.ndarray) -> np.ndarray:
    """Native multi-target BFS distances: (T, H, W) int32, INT32_MAX where
    unreachable. Fast host-side counterpart of layout._bfs_fields."""
    lib = _load()
    p = np.ascontiguousarray(passable, dtype=np.uint8)
    h, w = p.shape
    t = np.ascontiguousarray(
        targets_yx[:, 0].astype(np.int64) * w + targets_yx[:, 1], dtype=np.int32
    )
    out = np.empty((t.shape[0], h, w), dtype=np.int32)
    lib.bfs_fields_c(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
