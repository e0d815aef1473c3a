"""Point-cloud geometry primitives, pure-JAX (XLA) implementations.

These re-create, TPU-natively, the semantics of the reference CUDA kernels in
``openpoints/cpp/pointnet2_batch/src`` (cited per-op below). All ops use static
shapes, batched layouts, and XLA-friendly control flow (`lax.scan`, `top_k`)
so they fuse and tile onto the MXU/VPU. Pallas variants of the hot ops live in
``adaptpoint_tpu.ops.pallas`` and are dispatched via ``adaptpoint_tpu.ops``.

Layout convention: points are channels-last ``(B, N, 3)``; features are
channels-last ``(B, N, C)`` (TPU lanes = channels for pointwise MLPs, and
B*N rows map to MXU sublanes).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "square_distance",
    "furthest_point_sample_xla",
    "random_sample",
    "ball_query_xla",
    "knn_point",
    "three_nn_xla",
    "three_interpolate",
    "three_interpolation",
    "index_points",
    "gather_index",
]


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distance. src (B,N,C), dst (B,M,C) -> (B,N,M).

    Computed as ||a||^2 + ||b||^2 - 2ab so the cross term rides the MXU
    (parity: generator_component4_15.py:40-59 `square_distance`).
    """
    # HIGHEST precision: the cross term feeds strict radius comparisons
    # (ball query) — default TPU f32 matmul (bf16 passes) is not accurate enough.
    cross = jnp.einsum("bnc,bmc->bnm", src, dst,
                       preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)[:, :, None]
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)[:, None, :]
    return s2 + d2 - 2.0 * cross


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather points by per-batch indices.

    points (B, N, C); idx (B, ...) int -> (B, ..., C)
    (parity: generator_component4_15.py:74-90 `index_points`).
    """
    B = points.shape[0]
    C = points.shape[-1]
    flat_idx = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat_idx[..., None].astype(jnp.int32), axis=1)
    return out.reshape(idx.shape + (C,))


# alias used by layers for gathering subsampled centroids
gather_index = index_points


@partial(jax.jit, static_argnums=1)
def furthest_point_sample_xla(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative furthest point sampling. xyz (B,N,3) -> idx (B,npoint) int32.

    Exact reference semantics (cpp/pointnet2_batch/src/sampling_gpu.cu:101-216):
    the first selected index is 0; each step updates the running min-distance
    to the selected set and picks its argmax.
    """
    B, N, _ = xyz.shape
    x = xyz.astype(jnp.float32)

    def body(carry, _):
        mind, last = carry
        sel = jnp.take_along_axis(x, last[:, None, None].astype(jnp.int32), axis=1)  # (B,1,3)
        d = jnp.sum((x - sel) ** 2, axis=-1)  # (B,N)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind, axis=-1).astype(jnp.int32)  # (B,)
        return (mind, nxt), nxt

    init = (jnp.full((B, N), 1e10, jnp.float32), jnp.zeros((B,), jnp.int32))
    if npoint == 1:
        return jnp.zeros((B, 1), jnp.int32)
    (_, _), rest = lax.scan(body, init, None, length=npoint - 1)
    first = jnp.zeros((B, 1), jnp.int32)
    return jnp.concatenate([first, rest.T.astype(jnp.int32)], axis=1)


def random_sample(rng, xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Uniform random index sampling (parity: models/layers/subsample.py:70-73)."""
    B, N, _ = xyz.shape
    return jax.random.randint(rng, (B, npoint), 0, N, dtype=jnp.int32)


@partial(jax.jit, static_argnums=(0, 1))
def ball_query_xla(radius: float, nsample: int, xyz: jnp.ndarray,
                   new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Ball query: first ``nsample`` support points strictly within ``radius``
    of each query center, in original point order, padded with the first found
    (all-zero rows when the ball is empty).

    Exact reference semantics (cpp/pointnet2_batch/src/ball_query_gpu.cu:16-51):
    strict ``d2 < radius^2``; on finding the first in-ball point, all slots are
    pre-filled with its index; indices stay 0 if the ball is empty.

    xyz (B,N,3) support; new_xyz (B,M,3) centers -> idx (B,M,nsample) int32.
    """
    N = xyz.shape[1]
    # DIRECT-form distances (dx^2 + dy^2 + dz^2), matching the CUDA
    # reference's own arithmetic (ball_query_gpu.cu:39) and the Pallas
    # kernel bit-for-bit — the expanded |a|^2+|b|^2-2ab form disagrees by
    # ULPs at the strict radius boundary
    diff = new_xyz[:, :, None, :] - xyz[:, None, :, :]  # (B,M,N,3)
    d2 = jnp.sum(diff * diff, axis=-1)
    inball = d2 < jnp.float32(radius) ** 2
    ar = lax.broadcasted_iota(jnp.int32, d2.shape, 2)
    # keys: in-ball points keep original order; out-of-ball pushed past N
    key = jnp.where(inball, ar, ar + N)
    k_eff = min(nsample, N)
    neg_topk, idx = lax.top_k(-key, k_eff)  # k smallest keys
    kkey = -neg_topk
    valid = kkey < N
    first = idx[..., :1]
    # empty ball: smallest key is N+0 at slot 0 -> first==0, matching memset(0)
    out = jnp.where(valid, idx, first).astype(jnp.int32)
    if k_eff < nsample:  # tiny clouds: extra slots follow the pad-with-first rule
        pad = jnp.broadcast_to(first.astype(jnp.int32),
                               out.shape[:-1] + (nsample - k_eff,))
        out = jnp.concatenate([out, pad], axis=-1)
    return out


@partial(jax.jit, static_argnums=1)
def _iter_min_k(d2: jnp.ndarray, k: int):
    """Exact smallest-k by k sequential (min, argmin, mask) passes.

    11x faster than lax.top_k on TPU for small k (top_k lowers to a
    full sort: 20.7 vs 1.8 ms for k=3 at (32,2048,1024)); tie-breaking =
    first index, identical to stable top_k and the CUDA 3-NN scan."""
    cur = d2
    lane = lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    ds, idxs = [], []
    for _ in range(k):
        i = jnp.argmin(cur, axis=-1)
        ds.append(jnp.min(cur, axis=-1))
        idxs.append(i)
        cur = jnp.where(lane == i[..., None], jnp.inf, cur)
    return jnp.stack(ds, axis=-1), jnp.stack(idxs, axis=-1).astype(jnp.int32)


# crossover (measured, scripts note in ops/pallas): iterative wins up to
# ~k=24 (14.6 vs 20.6 ms) but top_k amortizes for very large k
_ITER_K_MAX = 24


@partial(jax.jit, static_argnums=0)
def knn_point(nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray):
    """k-nearest neighbors of new_xyz (B,M,C) among xyz (B,N,C).

    Returns (dists2, idx) with shapes (B,M,k); parity with
    generator_component4_15.py:61-72 (`knn_point`, smallest-k).
    """
    N = xyz.shape[1]
    k_eff = min(nsample, N)
    d2 = square_distance(new_xyz, xyz)
    if k_eff <= _ITER_K_MAX:
        d2k, idx = _iter_min_k(d2, k_eff)
    else:
        neg, idx = lax.top_k(-d2, k_eff)
        d2k, idx = -neg, idx.astype(jnp.int32)
    if k_eff < nsample:  # tiny clouds: repeat the nearest neighbor
        reps = nsample - k_eff
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[..., :1], idx.shape[:-1] + (reps,))], -1)
        d2k = jnp.concatenate(
            [d2k, jnp.broadcast_to(d2k[..., :1], d2k.shape[:-1] + (reps,))], -1)
    return d2k, idx


@jax.jit
def three_nn_xla(unknown: jnp.ndarray, known: jnp.ndarray):
    """3 nearest neighbors of each unknown point among known points.

    Returns (dist, idx): euclidean (sqrt) distances, matching the reference
    CUDA kernel (cpp/pointnet2_batch/src/interpolate_gpu.cu, three_nn).
    unknown (B,N,3), known (B,M,3) -> (B,N,3), (B,N,3) int32.
    """
    d2, idx = knn_point(3, known, unknown)
    return jnp.sqrt(jnp.maximum(d2, 0.0)), idx


@jax.jit
def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted 3-point feature interpolation.

    features (B,M,C) channels-last, idx (B,N,3), weight (B,N,3) -> (B,N,C).
    Differentiable via XLA gather (reference uses a custom grad kernel,
    cpp/pointnet2_batch/src/interpolate_gpu.cu three_interpolate_grad).
    """
    gathered = index_points(features, idx)  # (B,N,3,C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def three_interpolation(unknown_xyz: jnp.ndarray, known_xyz: jnp.ndarray,
                        known_feat: jnp.ndarray) -> jnp.ndarray:
    """Full FP upsampling: 3-NN + inverse-distance-weighted interpolation.

    Parity: models/layers/upsampling.py:92-102 (weights from reciprocal
    distances normalized to sum 1, eps 1e-8).
    """
    dist, idx = three_nn_xla(unknown_xyz, known_xyz)
    dist_recip = 1.0 / (dist + 1e-8)
    norm = jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm
    return three_interpolate(known_feat, idx, weight)
