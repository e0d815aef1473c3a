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
from typing import Tuple

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
