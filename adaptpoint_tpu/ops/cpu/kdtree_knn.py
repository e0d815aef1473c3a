"""KD-tree kNN — ctypes binding to the C++ op, with a numpy fallback.

Parity: the reference's vendored nearest_neighbors package
(openpoints/dataset/semantic_kitti/utils/nearest_neighbors/knn.pyx) used for
host-side scene preprocessing.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CPP = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "cpp")
_SRC = os.path.join(_CPP, "kdtree_knn.cpp")
_LIB = os.path.join(_CPP, "libkdtreeknn.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or (os.path.exists(_SRC) and
                                    os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                           check=True, capture_output=True)
        except Exception as e:
            logging.warning("kdtree_knn build failed (%s); numpy fallback", e)
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB)
        lib.kdtree_knn.restype = None
        lib.kdtree_knn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except OSError as e:
        logging.warning("kdtree_knn load failed (%s); numpy fallback", e)
        _lib = False
    return _lib


def _numpy_knn(support, queries, k):
    d2 = ((queries[:, None, :] - support[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k].astype(np.int32)
    return idx, np.take_along_axis(d2, idx, 1).astype(np.float32)


def kdtree_knn(support: np.ndarray, queries: np.ndarray, k: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """support (N,3), queries (M,3) -> (idx (M,k) i32, d2 (M,k) f32),
    sorted ascending."""
    support = np.ascontiguousarray(support, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    lib = _load()
    if lib is False:
        return _numpy_knn(support, queries, k)
    m = queries.shape[0]
    out_idx = np.empty((m, k), np.int32)
    out_d2 = np.empty((m, k), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.kdtree_knn(support.ctypes.data_as(fp), support.shape[0],
                   queries.ctypes.data_as(fp), m, k,
                   out_idx.ctypes.data_as(ip), out_d2.ctypes.data_as(fp))
    return out_idx, out_d2


def knn_search(support_pts: np.ndarray, query_pts: np.ndarray, k: int
               ) -> np.ndarray:
    """Batched host kNN (parity:
    openpoints/dataset/semantic_kitti/helper_tool.py:134-143
    nearest_neighbors.knn_batch): support (B,N,3) + query (B,M,3)
    -> idx (B,M,k) int32. Unbatched 2D inputs are also accepted."""
    support_pts = np.asarray(support_pts, np.float32)
    query_pts = np.asarray(query_pts, np.float32)
    if support_pts.ndim == 2:
        return kdtree_knn(support_pts, query_pts, k)[0]
    return np.stack([kdtree_knn(s, q, k)[0]
                     for s, q in zip(support_pts, query_pts)])


class KDTree:
    """Persistent KD-tree with kNN + sorted radius queries (parity: the
    sklearn KDTree used by openpoints/dataset/s3dis/s3dis_sphere.py:167,
    query_radius(sort_results=True) + query). C++ handle API with a numpy
    fallback. Not pickled — rebuild from points on load (build is O(N log N))."""

    def __init__(self, points: np.ndarray):
        self.points = np.ascontiguousarray(points, np.float32)
        self._handle = None
        lib = _load()
        if lib is not False:
            if not hasattr(lib, "kdtree_build_ok"):
                lib.kdtree_build.restype = ctypes.c_void_p
                lib.kdtree_build.argtypes = [ctypes.POINTER(ctypes.c_float),
                                             ctypes.c_int64]
                lib.kdtree_free.argtypes = [ctypes.c_void_p]
                lib.kdtree_query.restype = None
                lib.kdtree_query.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64, ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_float)]
                lib.kdtree_radius.restype = ctypes.c_int64
                lib.kdtree_radius.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                    ctypes.c_float, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_float)]
                lib.kdtree_build_ok = True
            fp = ctypes.POINTER(ctypes.c_float)
            self._handle = lib.kdtree_build(
                self.points.ctypes.data_as(fp), self.points.shape[0])
            self._lib = lib

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.kdtree_free(self._handle)
            self._handle = None

    def __getstate__(self):  # pickle: points only, rebuild on load
        return {"points": self.points}

    def __setstate__(self, state):
        self.__init__(state["points"])

    def query(self, queries: np.ndarray, k: int = 1):
        """(M,3) -> (idx (M,k), d2 (M,k)) sorted ascending."""
        queries = np.ascontiguousarray(np.atleast_2d(queries), np.float32)
        if self._handle is None:
            return _numpy_knn(self.points, queries, k)
        m = queries.shape[0]
        out_idx = np.empty((m, k), np.int32)
        out_d2 = np.empty((m, k), np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        self._lib.kdtree_query(self._handle, queries.ctypes.data_as(fp), m, k,
                               out_idx.ctypes.data_as(ip),
                               out_d2.ctypes.data_as(fp))
        return out_idx, out_d2

    def query_radius(self, query: np.ndarray, r: float,
                     max_out: Optional[int] = None) -> np.ndarray:
        """Indices within r of a single (3,) query, sorted by distance."""
        query = np.ascontiguousarray(query, np.float32).reshape(-1)[:3]
        if max_out is None:
            max_out = self.points.shape[0]
        if self._handle is None:
            d2 = ((self.points - query[None, :]) ** 2).sum(-1)
            idx = np.where(d2 <= r * r)[0]
            order = np.argsort(d2[idx], kind="stable")
            return idx[order][:max_out].astype(np.int32)
        out_idx = np.empty(max_out, np.int32)
        out_d2 = np.empty(max_out, np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        n = self._lib.kdtree_radius(self._handle, query.ctypes.data_as(fp),
                                    r, max_out, out_idx.ctypes.data_as(ip),
                                    out_d2.ctypes.data_as(fp))
        return out_idx[:n]
