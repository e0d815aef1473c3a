"""Neighborhood grouping (ball query / kNN / group-all) as pure functions.

TPU re-design of openpoints/models/layers/group.py:206-352: groupers carry no
parameters, so they are plain callables over channels-last arrays instead of
nn.Modules. Returns are channels-last: dp (B, M, K, 3), fj (B, M, K, C).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from ...ops import ball_query, knn_point, index_points

__all__ = ["QueryAndGroup", "KNNGroup", "GroupAll", "create_grouper",
           "get_aggregation_features"]


@dataclass(frozen=True)
class QueryAndGroup:
    """Ball-query grouping (parity: group.py:206-255 QueryAndGroup).

    relative_xyz subtracts the query center; normalize_dp divides by radius.
    """

    radius: float
    nsample: int
    relative_xyz: bool = True
    normalize_dp: bool = False

    def __call__(self, query_xyz, support_xyz, features=None):
        idx = ball_query(self.radius, self.nsample, support_xyz, query_xyz)
        dp = index_points(support_xyz, idx)  # (B,M,K,3)
        if self.relative_xyz:
            dp = dp - query_xyz[:, :, None, :]
            if self.normalize_dp:
                dp = dp / self.radius
        fj = index_points(features, idx) if features is not None else None
        return dp, fj


@dataclass(frozen=True)
class KNNGroup:
    """kNN grouping (parity: group.py:275-320 KNNGroup)."""

    nsample: int
    relative_xyz: bool = True
    normalize_dp: bool = False

    def __call__(self, query_xyz, support_xyz, features=None):
        _, idx = knn_point(self.nsample, support_xyz, query_xyz)
        dp = index_points(support_xyz, idx)
        if self.relative_xyz:
            dp = dp - query_xyz[:, :, None, :]
        if self.normalize_dp:
            # normalize by per-cloud max neighbor distance (group.py:314-315)
            maxd = jnp.sqrt(jnp.sum(dp ** 2, axis=-1)).max(axis=(1, 2))
            dp = dp / maxd[:, None, None, None]
        fj = index_points(features, idx) if features is not None else None
        return dp, fj


@dataclass(frozen=True)
class GroupAll:
    """All points in one group (parity: group.py:258-272 GroupAll)."""

    def __call__(self, query_xyz, support_xyz, features=None):
        dp = support_xyz[:, None, :, :]  # (B,1,N,3)
        fj = features[:, None, :, :] if features is not None else None
        return dp, fj


def create_grouper(group_args: dict):
    """Grouper factory (parity: group.py:338-352 create_grouper)."""
    args = dict(group_args or {})
    method = args.pop("NAME", "ballquery")
    radius = args.pop("radius", 0.1)
    nsample = args.pop("nsample", 20)
    known = ("relative_xyz", "normalize_dp")
    kwargs = {k: v for k, v in args.items() if k in known}
    if nsample is not None:
        nsample = int(nsample)
        if method == "ballquery":
            return QueryAndGroup(float(radius), nsample, **kwargs)
        if method == "knn":
            return KNNGroup(nsample, **kwargs)
        raise ValueError(f"unknown grouper {method}")
    return GroupAll()


def get_aggregation_features(p, dp, f, fj, feature_type="dp_fj"):
    """Assemble per-neighbor features (parity: group.py:323-335), channels-last.

    p (B,M,3), dp (B,M,K,3), f (B,M,C) center features (or None),
    fj (B,M,K,C) neighbor features.
    """
    if feature_type == "dp_fj":
        return jnp.concatenate([dp, fj], axis=-1)
    if feature_type == "dp_fj_df":
        df = fj - f[:, :, None, :]
        return jnp.concatenate([dp, fj, df], axis=-1)
    if feature_type == "pi_dp_fj_df":
        df = fj - f[:, :, None, :]
        pi = jnp.broadcast_to(p[:, :, None, :], dp.shape)
        return jnp.concatenate([pi, dp, fj, df], axis=-1)
    if feature_type == "dp_df":
        df = fj - f[:, :, None, :]
        return jnp.concatenate([dp, df], axis=-1)
    raise ValueError(f"unknown feature_type {feature_type}")
