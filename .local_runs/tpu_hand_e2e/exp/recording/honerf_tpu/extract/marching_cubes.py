"""ctypes binding to the C++ marching-cubes host extension.

The native source lives in native/marching_cubes.cpp and is compiled
lazily with g++ the first time it is needed (cached next to the source).
The device side (chunked SDF grid evaluation) is in
`honerf_tpu.extract.grid`; this module is host-only.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB = None

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "marching_cubes.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "libmarching_cubes.so")


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)
    return _SO


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build())
            lib.mc_run.restype = ctypes.c_int
            lib.mc_run.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.mc_free.restype = None
            lib.mc_free.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
            ]
            _LIB = lib
    return _LIB


def marching_cubes(grid: np.ndarray, iso: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a (nx, ny, nz) scalar grid.

    Returns (vertices (V, 3) float32 in grid-index coordinates,
    triangles (T, 3) int64) — the PyMCubes-compatible convention the
    reference rescales from (utils/renderer.py:279-283).
    """
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    assert grid.ndim == 3, grid.shape
    lib = _lib()
    verts_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int)()
    n_verts = ctypes.c_long()
    n_tris = ctypes.c_long()
    rc = lib.mc_run(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        grid.shape[0], grid.shape[1], grid.shape[2],
        ctypes.c_float(iso),
        ctypes.byref(verts_p), ctypes.byref(n_verts),
        ctypes.byref(tris_p), ctypes.byref(n_tris),
    )
    if rc != 0:
        raise MemoryError("marching cubes allocation failed")
    try:
        v = np.ctypeslib.as_array(verts_p, shape=(n_verts.value, 3)).copy() \
            if n_verts.value else np.zeros((0, 3), np.float32)
        t = np.ctypeslib.as_array(tris_p, shape=(n_tris.value, 3)).astype(np.int64) \
            if n_tris.value else np.zeros((0, 3), np.int64)
    finally:
        lib.mc_free(verts_p, tris_p)
    return v, t
