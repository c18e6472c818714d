"""ctypes binding for the native isosurface extractor.

Replaces PyMCubes (reference utils/ops.py:198-207, utils/export.py:148).
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from .build import build_and_load

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        _lib = build_and_load("mcubes")
        _lib.mt_marching_tetrahedra.restype = ctypes.c_int
        _lib.mt_marching_tetrahedra.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
    return _lib


def marching_cubes(grid: np.ndarray, iso: float
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a [nx, ny, nz] float grid.

    Returns (verts [V, 3] float32 in grid-index units, faces [F, 3]
    int32).  Capacity grows geometrically on overflow.
    """
    lib = _get_lib()
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = grid.shape
    cap_v = max(1 << 16, nx * ny * 4)
    cap_f = cap_v * 2
    while True:
        verts = np.empty((cap_v, 3), np.float32)
        faces = np.empty((cap_f, 3), np.int32)
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        rc = lib.mt_marching_tetrahedra(
            grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nx, ny, nz, ctypes.c_float(iso),
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap_v,
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap_f,
            ctypes.byref(nv), ctypes.byref(nf))
        if rc == 0:
            return verts[:nv.value].copy(), faces[:nf.value].copy()
        cap_v *= 4
        cap_f *= 4
