"""Dispatching op layer: Pallas kernels on TPU, pure-XLA elsewhere.

Set ``ADAPTPOINT_TPU_KERNELS=xla`` to force the XLA reference implementations
(e.g. for golden-value comparison); ``=pallas`` to force Pallas.
"""
from __future__ import annotations

import os

import jax

from .geometry import (
    square_distance,
    furthest_point_sample_xla,
    random_sample,
    ball_query_xla,
    knn_point,
    three_nn_xla,
    three_interpolate,
    three_interpolation,
    index_points,
    gather_index,
)
from .pallas import furthest_point_sample_pallas

__all__ = [
    "square_distance", "furthest_point_sample", "random_sample", "ball_query",
    "knn_point", "three_nn", "three_interpolate", "three_interpolation",
    "index_points", "gather_index", "fps",
]


def _use_pallas() -> bool:
    mode = os.environ.get("ADAPTPOINT_TPU_KERNELS", "auto").lower()
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def furthest_point_sample(xyz, npoint: int):
    """FPS dispatch (see geometry.furthest_point_sample_xla for semantics)."""
    if _use_pallas():
        return furthest_point_sample_pallas(xyz, npoint)
    return furthest_point_sample_xla(xyz, npoint)


# ball query / three_nn are XLA top_k based on all backends (MXU-friendly);
# kept behind names without _xla suffix for call-site stability.
ball_query = ball_query_xla
three_nn = three_nn_xla


def fps(data, number: int):
    """FPS + gather, parity with models/layers/subsample.py:148-156 `fps`."""
    idx = furthest_point_sample(data[..., :3], number)
    return index_points(data, idx)
