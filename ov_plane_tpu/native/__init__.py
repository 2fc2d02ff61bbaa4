"""Native (C++) host-side components: Delaunay triangulation, voxel point map.

Compiled on first use with g++ (no external deps); Python bindings via ctypes.
Equivalents of the reference's vendored CDT and ikd-tree (SURVEY.md §2.2).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build_and_load(name: str) -> ctypes.CDLL:
    """Compile <name>.cpp into <name>.so (cached) and dlopen it."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        so = os.path.join(_DIR, f"lib{name}.so")
        if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        _LIBS[name] = lib
        return lib


def delaunay(points_xy: np.ndarray) -> np.ndarray:
    """Delaunay-triangulate 2D points. Returns [T, 3] int32 triangle indices.

    Native Bowyer-Watson (delaunay.cpp); falls back to scipy.spatial.Delaunay
    (Qhull) if the native build is unavailable.
    """
    pts = np.ascontiguousarray(points_xy, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.zeros((0, 3), np.int32)
    try:
        lib = _build_and_load("delaunay")
        lib.delaunay_triangulate.restype = ctypes.c_int
        max_tris = 3 * n
        out = np.zeros((max_tris, 3), np.int32)
        count = lib.delaunay_triangulate(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int(n),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(max_tris),
        )
        if count >= 0:
            return out[:count]
    except (OSError, subprocess.CalledProcessError):
        pass
    from scipy.spatial import Delaunay as _SciDelaunay

    return _SciDelaunay(pts).simplices.astype(np.int32)


class VoxelPointMap:
    """Incremental voxel-hash point map (native ikd_grid.cpp).

    API mirrors the surface the reference consumes from the ikd-tree
    (Build/Add_Points/Nearest_Search/flatten, ikd_tree.h:240-261).
    """

    def __init__(self, voxel: float = 0.5, downsample: float = 0.1):
        self._lib = _build_and_load("ikd_grid")
        self._lib.ikd_create.restype = ctypes.c_void_p
        self._lib.ikd_add.restype = ctypes.c_int
        self._lib.ikd_size.restype = ctypes.c_int
        self._lib.ikd_knn.restype = ctypes.c_int
        self._lib.ikd_flatten.restype = ctypes.c_int
        self._h = ctypes.c_void_p(self._lib.ikd_create(ctypes.c_double(voxel), ctypes.c_double(downsample)))

    def __del__(self):
        try:
            self._lib.ikd_destroy(self._h)
        except Exception:
            pass

    def add(self, xyz: np.ndarray, ids: np.ndarray | None = None, downsample: bool = False) -> int:
        xyz = np.ascontiguousarray(xyz, np.float64).reshape(-1, 3)
        n = len(xyz)
        idp = None
        if ids is not None:
            ids = np.ascontiguousarray(ids, np.int32)
            idp = ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        return self._lib.ikd_add(
            self._h, xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), idp,
            ctypes.c_int(n), ctypes.c_int(1 if downsample else 0),
        )

    def __len__(self) -> int:
        return self._lib.ikd_size(self._h)

    def knn(self, query: np.ndarray, k: int):
        """Returns (dists[k'], xyz[k',3], ids[k']) sorted ascending."""
        q = np.ascontiguousarray(query, np.float64).reshape(3)
        d = np.zeros(k, np.float64)
        xyz = np.zeros((k, 3), np.float64)
        ids = np.zeros(k, np.int32)
        found = self._lib.ikd_knn(
            self._h, q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), ctypes.c_int(k),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return d[:found], xyz[:found], ids[:found]

    def flatten(self, max_n: int = 1 << 20):
        xyz = np.zeros((max_n, 3), np.float64)
        ids = np.zeros(max_n, np.int32)
        n = self._lib.ikd_flatten(
            self._h, xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), ctypes.c_int(max_n),
        )
        return xyz[:n], ids[:n]

    def clear(self):
        self._lib.ikd_clear(self._h)
