"""Batched k-means on device (parity: openpoints/models/layers/kmeans.py,
used by clustering-based group embeddings). Lloyd iterations under lax.scan,
centroids initialized by FPS for determinism.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops import furthest_point_sample, index_points, square_distance

__all__ = ["kmeans"]


@partial(jax.jit, static_argnums=(1, 2))
def kmeans(points: jnp.ndarray, n_clusters: int, n_iters: int = 10):
    """points (B, N, C) -> (assignments (B, N) int32, centroids (B, K, C)).

    FPS seeding over the first 3 dims (or all dims if C<3)."""
    seed_space = points[..., :3] if points.shape[-1] >= 3 else points
    init_idx = furthest_point_sample(seed_space, n_clusters)
    centroids = index_points(points, init_idx)  # (B, K, C)

    def step(centroids, _):
        d2 = square_distance(points, centroids)  # (B, N, K)
        assign = jnp.argmin(d2, axis=-1)  # (B, N)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=points.dtype)
        num = jnp.einsum("bnk,bnc->bkc", onehot, points)
        den = jnp.maximum(onehot.sum(axis=1)[..., None], 1.0)
        return num / den, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=n_iters)
    d2 = square_distance(points, centroids)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32), centroids
