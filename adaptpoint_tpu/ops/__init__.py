"""Dispatching op layer: Pallas kernels on TPU, pure-XLA elsewhere.

Set ``ADAPTPOINT_TPU_KERNELS=xla`` to force the XLA reference implementations
(e.g. for golden-value comparison); ``=pallas`` to force Pallas.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

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
from .pallas.ballgroup import ball_group_pallas

__all__ = [
    "square_distance", "furthest_point_sample", "random_sample", "ball_query",
    "knn_point", "three_nn", "three_interpolate", "three_interpolation",
    "index_points", "gather_index", "fps", "ball_group", "gather_rows",
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
    """FPS dispatch (see geometry.furthest_point_sample_xla for semantics).

    Index outputs carry no gradient (reference FurthestPointSampling.backward
    returns None, subsample.py:100-102); stop_gradient keeps JAX AD from
    attempting a JVP of the Pallas call."""
    import jax
    xyz = jax.lax.stop_gradient(xyz)
    if _use_pallas():
        return furthest_point_sample_pallas(xyz, npoint)
    return furthest_point_sample_xla(xyz, npoint)


# ball query / three_nn are XLA top_k based on all backends (MXU-friendly);
# kept behind names without _xla suffix for call-site stability.
ball_query = ball_query_xla
three_nn = three_nn_xla


def gather_rows(points, idx):
    """Exact (B,M,C) row gather of (B,N,C) by (B,M) — Pallas one-hot matmul
    on TPU, take_along_axis elsewhere."""
    if _use_pallas() and points.ndim == 3 and idx.ndim == 2 \
            and points.dtype == jnp.float32:
        from .pallas.gather import gather_rows_pallas, gather_fits
        if gather_fits(points.shape[1], points.shape[2], idx.shape[1]):
            return gather_rows_pallas(points, idx)
    return _index_points_xla(points, idx)


# Dispatching index_points: every (B,N,C) f32 gather — any idx rank — runs as
# Pallas one-hot MXU matmuls on TPU (XLA's row gather is ~10GB/s effective;
# this is the single biggest model-wide win, SURVEY.md §2.3 TPU plan).
_index_points_xla = index_points


def index_points(points, idx):  # noqa: F811  (intentional dispatcher shadow)
    import jax.numpy as _jnp
    if _use_pallas() and getattr(points, "ndim", 0) == 3 \
            and points.dtype == _jnp.float32 and getattr(idx, "ndim", 0) >= 2:
        b = points.shape[0]
        flat = idx.reshape(b, -1)
        from .pallas.gather import gather_rows_pallas, gather_fits
        if flat.shape[1] > 0 and gather_fits(points.shape[1],
                                             points.shape[2], flat.shape[1]):
            out = gather_rows_pallas(points, flat)
            return out.reshape(tuple(idx.shape) + (points.shape[-1],))
    return _index_points_xla(points, idx)


def three_interpolation(unknown_xyz, known_xyz, known_feat):
    """FP upsampling with the dispatching gather (parity:
    geometry.three_interpolation)."""
    import jax.numpy as _jnp
    dist, idx = three_nn(unknown_xyz, known_xyz)
    dist_recip = 1.0 / (dist + 1e-8)
    norm = _jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm
    gathered = index_points(known_feat, idx)  # (B,N,3,C)
    return _jnp.sum(gathered * weight[..., None], axis=2)


def fps(data, number: int):
    """FPS + gather, parity with models/layers/subsample.py:148-156 `fps`."""
    idx = furthest_point_sample(data[..., :3], number)
    return gather_rows(data, idx)


def _ball_group_xla(radius, nsample, xyz, query_idx, feats,
                    relative=True, normalize_dp=False):
    """XLA composite with the fused-kernel signature (CPU/test fallback)."""
    import jax.numpy as jnp
    new_xyz = index_points(xyz, query_idx)
    fi = index_points(feats, query_idx)
    idx = ball_query_xla(radius, nsample, xyz, new_xyz)
    dp = index_points(xyz, idx)  # (B,M,K,3)
    if relative:
        dp = dp - new_xyz[:, :, None, :]
        if normalize_dp:
            dp = dp / radius
    fj = index_points(feats, idx)
    dpfj = jnp.concatenate([dp, fj], axis=-1)
    return new_xyz, fi, jnp.transpose(dpfj, (0, 2, 1, 3)), idx


def ball_group(radius, nsample, xyz, query_idx, feats,
               relative=True, normalize_dp=False):
    """Fused center-gather + ball query + neighborhood grouping.

    Returns (new_xyz (B,M,3), fi (B,M,C), dpfj (B,K,M,3+C) fused [dp || fj],
    idx (B,M,K)). Pallas on TPU (ops/pallas/ballgroup.py), XLA elsewhere —
    bit-identical outputs.
    """
    # pallas tiles need M divisible by 8 (qidx sublane constraint)
    if _use_pallas() and query_idx.shape[1] % 8 == 0:
        return ball_group_pallas(radius, nsample, xyz, query_idx, feats,
                                 relative, normalize_dp)
    return _ball_group_xla(radius, nsample, xyz, query_idx, feats,
                           relative, normalize_dp)
