"""Voxel-grid barycenter subsampling — ctypes binding to the C++ op, with a
numpy fallback.

Parity: openpoints/cpp/subsampling (grid_subsampling.cpp:1-106) and its
Python wrapper openpoints/dataset/grid_sample.py:1-30. Used by the scene-seg
(S3DIS) preprocessing pipeline.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "cpp",
                    "grid_subsampling.cpp")
_LIB = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "cpp",
                    "libgridsubsample.so")

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
        except Exception as e:  # toolchain unavailable: numpy fallback
            logging.warning("grid_subsample C++ build failed (%s); numpy fallback", e)
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB)
        lib.grid_subsample.restype = ctypes.c_int64
        lib.grid_subsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        _lib = lib
    except OSError as e:
        logging.warning("grid_subsample load failed (%s); numpy fallback", e)
        _lib = False
    return _lib


def _numpy_grid_subsample(points, feats, sample_dl):
    vox = np.floor((points - points.min(axis=0)) / sample_dl).astype(np.int64)
    # first-appearance voxel order matches the C++ insertion order
    _, first_idx, inv = np.unique(
        vox, axis=0, return_index=True, return_inverse=True)
    order = np.argsort(first_idx)
    remap = np.empty_like(order)
    remap[order] = np.arange(len(order))
    inv = remap[inv]
    n_out = len(order)
    counts = np.bincount(inv, minlength=n_out).astype(np.float64)
    out_p = np.stack([np.bincount(inv, weights=points[:, d], minlength=n_out)
                      for d in range(3)], axis=1) / counts[:, None]
    out_f = None
    if feats is not None:
        out_f = np.stack([np.bincount(inv, weights=feats[:, d], minlength=n_out)
                          for d in range(feats.shape[1])], axis=1) / counts[:, None]
        out_f = out_f.astype(np.float32)
    return out_p.astype(np.float32), out_f


def grid_subsample(points: np.ndarray, feats: Optional[np.ndarray] = None,
                   sample_dl: float = 0.04
                   ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """points (N,3) f32, optional feats (N,F) f32 -> voxel barycenters."""
    points = np.ascontiguousarray(points, np.float32)
    f = 0 if feats is None else feats.shape[1]
    if feats is not None:
        feats = np.ascontiguousarray(feats, np.float32)
    lib = _load()
    if lib is False:
        return _numpy_grid_subsample(points, feats, sample_dl)
    fp = ctypes.POINTER(ctypes.c_float)
    n = points.shape[0]
    count = lib.grid_subsample(points.ctypes.data_as(fp), n,
                               feats.ctypes.data_as(fp) if feats is not None else None,
                               f, ctypes.c_float(sample_dl), None, None, 0)
    out_p = np.empty((count, 3), np.float32)
    out_f = np.empty((count, f), np.float32) if f else None
    lib.grid_subsample(points.ctypes.data_as(fp), n,
                       feats.ctypes.data_as(fp) if feats is not None else None,
                       f, ctypes.c_float(sample_dl),
                       out_p.ctypes.data_as(fp),
                       out_f.ctypes.data_as(fp) if f else None, count)
    return out_p, out_f
