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
    "nested_fps_enabled", "fps_prefix_idx",
]


# ball_group/ball_group_max Pallas dispatch threshold (B*M*K*N one-hot
# elements). Module-level so tests can monkeypatch it to force the internal
# pad-then-slice branch at CPU-sized problems (ADVICE r4).
PALLAS_WORK_MIN = 16 * 1024 * 1024


def _kernel_mode() -> str:
    return os.environ.get("ADAPTPOINT_TPU_KERNELS", "auto").lower()


def _dispatch(pallas_fn, xla_fn, *arrays):
    """Pick the Pallas or XLA implementation of an op.

    ``ADAPTPOINT_TPU_KERNELS=pallas|xla`` forces a branch. In ``auto`` mode the
    choice is made at *lowering* time via ``lax.platform_dependent``, so a
    single program that is jitted for several platforms (e.g. the multi-chip
    dryrun on a virtual CPU mesh while the default backend is TPU) always gets
    the branch that can actually lower — ``jax.default_backend()`` is not
    consulted. Only the selected branch is lowered; the Pallas branch is never
    compiled on CPU."""
    mode = _kernel_mode()
    if mode == "pallas":
        return pallas_fn(*arrays)
    if mode == "xla":
        return xla_fn(*arrays)
    return jax.lax.platform_dependent(*arrays, tpu=pallas_fn, default=xla_fn)


def furthest_point_sample(xyz, npoint: int):
    """FPS dispatch (see geometry.furthest_point_sample_xla for semantics).

    Index outputs carry no gradient (reference FurthestPointSampling.backward
    returns None, subsample.py:100-102); stop_gradient keeps JAX AD from
    attempting a JVP of the Pallas call."""
    import jax
    xyz = jax.lax.stop_gradient(xyz)
    return _dispatch(lambda x: furthest_point_sample_pallas(x, npoint),
                     lambda x: furthest_point_sample_xla(x, npoint),
                     xyz)


# ball query is XLA top_k based on all backends (MXU-friendly); kept behind
# a name without _xla suffix for call-site stability.
ball_query = ball_query_xla

_knn_point_xla = knn_point


def three_nn(unknown, known):
    """3-NN through the dispatching knn_point: on TPU at FP-upsampling
    shapes the Pallas kernel keeps the (TM,N) distance tile VMEM-resident
    (the XLA path materializes the full (B,N,M) matrix in HBM — the
    dominant cost of the augmentor's U-Net decode); d2 stays differentiable
    via the live-coordinate recompute. Semantics: geometry.three_nn_xla
    (reference interpolate_gpu.cu three_nn)."""
    d2, idx = knn_point(3, known, unknown)
    return jnp.sqrt(jnp.maximum(d2, 0.0)), idx


def knn_point(nsample: int, xyz, new_xyz):  # noqa: F811 (dispatcher shadow)
    """kNN dispatch: for k > 8 on TPU the Pallas kernel keeps the (TM,N)
    distance tile VMEM-resident across all k min-extraction passes (the XLA
    iterative path pays k full HBM passes over (B,M,N) — ~10-20 GB at DGCNN
    shapes). Small k stays on the differentiable XLA path (three_nn needs
    d2 gradients for interpolation weights).

    Differentiability parity: only ``idx`` comes from the Pallas kernel
    (indices carry no gradient, matching the reference); the returned ``d2``
    is RECOMPUTED from the live coordinates via a differentiable gather in
    the same ||a||^2+||b||^2-2ab form as ``square_distance``, so callers
    that feed d2-derived features into the loss (e.g. RandLA-Net relative
    encodings) get the same cotangents on every platform and shape. Callers
    that only consume idx pay nothing — XLA dead-code-eliminates the
    recompute."""
    k_eff = min(nsample, xyz.shape[1])
    # size guard (measured): pallas wins 3.3-5.5x at B=128 M=N=1024 K=20
    # and B=32 M=2048 K=24, loses at B=8 M=N=256 (0.84 vs 0.19 ms). Small k
    # (incl. the three_nn k=3) qualifies too since round 3: d2 is
    # differentiable on the Pallas branch via the live-coordinate recompute,
    # and the work gate keeps tiny problems on XLA. The distance-matrix
    # HBM traffic the kernel avoids is k-independent.
    work = xyz.shape[0] * new_xyz.shape[1] * xyz.shape[1] * max(k_eff, 16)
    if (k_eff >= 3 and xyz.ndim == 3 and new_xyz.shape[1] % 8 == 0
            and work >= 64 * 1024 * 1024 and _kernel_mode() != "xla"):
        from .pallas.knn import knn_pallas, knn_fits
        if knn_fits(xyz.shape[1], xyz.shape[2], k_eff):
            def _pallas(xyz, new_xyz):
                _, idx = knn_pallas(k_eff, jax.lax.stop_gradient(xyz),
                                    jax.lax.stop_gradient(new_xyz))
                if k_eff < nsample:
                    reps = nsample - k_eff
                    idx = jnp.concatenate(
                        [idx, jnp.broadcast_to(idx[..., :1],
                                               idx.shape[:-1] + (reps,))], -1)
                # differentiable d2 from live coords through the frozen idx
                # (dispatching gather: the XLA row gather here was ~1ms per
                # step at the FP-upsampling shapes)
                nbr = index_points(xyz, idx)  # (B,M,K,C)
                cross = jnp.einsum(
                    "bmc,bmkc->bmk", new_xyz, nbr,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                d2 = (jnp.sum(new_xyz.astype(jnp.float32) ** 2,
                              -1)[..., None]
                      + jnp.sum(nbr.astype(jnp.float32) ** 2, -1)
                      - 2.0 * cross)
                return d2, idx

            def _xla(xyz, new_xyz):
                return _knn_point_xla(nsample, xyz, new_xyz)

            return _dispatch(_pallas, _xla, xyz, new_xyz)
    return _knn_point_xla(nsample, xyz, new_xyz)


def _pad_knn(d2k, idx, nsample):
    """Tiny-cloud repeat-nearest padding (parity with geometry.knn_point)."""
    k_eff = idx.shape[-1]
    if k_eff >= nsample:
        return d2k, idx
    reps = nsample - k_eff
    idx = jnp.concatenate(
        [idx, jnp.broadcast_to(idx[..., :1], idx.shape[:-1] + (reps,))], -1)
    d2k = jnp.concatenate(
        [d2k, jnp.broadcast_to(d2k[..., :1], d2k.shape[:-1] + (reps,))], -1)
    return d2k, idx


def gather_rows(points, idx):
    """Exact (B,M,C) row gather of (B,N,C) by (B,M) — Pallas one-hot matmul
    on TPU, take_along_axis elsewhere. bf16 values are exact with one
    split (they ride the 1.0 one-hot multipliers into the f32 accumulator),
    so the bf16 compute policy's activations qualify too."""
    if (points.ndim == 3 and idx.ndim == 2
            and points.dtype in (jnp.float32, jnp.bfloat16)):
        from .pallas.gather import gather_rows_pallas, gather_fits
        if gather_fits(points.shape[1], points.shape[2], idx.shape[1]):
            return _dispatch(gather_rows_pallas, _index_points_xla,
                             points, idx)
    return _index_points_xla(points, idx)


# Dispatching index_points: every (B,N,C) f32 gather — any idx rank — runs as
# Pallas one-hot MXU matmuls on TPU (XLA's row gather is ~10GB/s effective;
# this is the single biggest model-wide win, SURVEY.md §2.3 TPU plan).
_index_points_xla = index_points


def index_points(points, idx):  # noqa: F811  (intentional dispatcher shadow)
    import jax.numpy as _jnp
    if getattr(points, "ndim", 0) == 3 \
            and points.dtype in (_jnp.float32, _jnp.bfloat16) \
            and getattr(idx, "ndim", 0) >= 2:
        b = points.shape[0]
        flat = idx.reshape(b, -1)
        from .pallas.gather import gather_rows_pallas, gather_fits
        if flat.shape[1] > 0 and gather_fits(points.shape[1],
                                             points.shape[2], flat.shape[1]):

            def _pallas(points, flat):
                out = gather_rows_pallas(points, flat)
                return out.reshape(tuple(idx.shape) + (points.shape[-1],))

            def _xla(points, flat):
                return _index_points_xla(points, idx)

            return _dispatch(_pallas, _xla, points, flat)
    return _index_points_xla(points, idx)


def three_interpolation(unknown_xyz, known_xyz, known_feat):
    """FP upsampling with the dispatching gather (parity:
    geometry.three_interpolation).

    bf16 features ride the fused weighted-gather Pallas kernel when the
    shape fits (gather + weighting + sum as one matmul; 1/3 the one-hot
    FLOPs, no (B,N,3,C) intermediate in either direction — see
    ops/pallas/fpinterp.py). f32 features keep the composite path: its
    f32 weighted sum is bit-exact, a parity requirement for the seg
    decoders. ``ADAPTPOINT_TPU_FPINTERP=0`` restores the composite
    everywhere."""
    import jax.numpy as _jnp
    dist, idx = three_nn(unknown_xyz, known_xyz)
    dist_recip = 1.0 / (dist + 1e-8)
    norm = _jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm
    if known_feat.dtype == _jnp.bfloat16 \
            and os.environ.get("ADAPTPOINT_TPU_FPINTERP", "1") != "0":
        from .pallas.fpinterp import weighted_gather3, weighted_gather3_fits
        B, M, C = known_feat.shape
        N = idx.shape[1]
        if weighted_gather3_fits(N, M, C):

            def _pallas(feat, idx, weight):
                return weighted_gather3(feat, idx, weight)

            def _xla(feat, idx, weight):
                gathered = index_points(feat, idx)
                return _jnp.sum(gathered * weight[..., None], axis=2)

            return _dispatch(_pallas, _xla, known_feat, idx, weight)
    gathered = index_points(known_feat, idx)  # (B,N,3,C)
    return _jnp.sum(gathered * weight[..., None], axis=2)


def fps(data, number: int):
    """FPS + gather, parity with models/layers/subsample.py:148-156 `fps`."""
    idx = furthest_point_sample(data[..., :3], number)
    return gather_rows(data, idx)


def nested_fps_enabled() -> bool:
    """Gate for the nested-FPS shortcut (default ON;
    ``ADAPTPOINT_TPU_NESTED_FPS=0`` restores the explicit kernels)."""
    return os.environ.get("ADAPTPOINT_TPU_NESTED_FPS", "1") != "0"


def fps_prefix_idx(batch: int, npoint: int):
    """FPS of a point set that is ALREADY in FPS selection order == arange.

    FPS is greedy, so its index sequence is prefix-nested: the first ``m``
    selections of FPS(X, n) are exactly FPS(X, m) for any m <= n, and for a
    subset S = FPS(X, n) listed in selection order, FPS(S, m) re-selects
    S[0..m) in order (the global argmax of the running min-distance lies in
    S at every step, so restricting the argmax to S changes nothing). Every
    encoder stage after the first FPS subsample receives its points in
    selection order, making the reference's per-stage FPS relaunch
    (sampling_gpu.cu:101-216 called per SA stage) a pure identity there —
    this returns the arange indices those stages should use instead of
    paying the sequential kernel. Exact up to distance ties (coincident
    points), where FPS is arbitrary in the reference too.
    """
    return jnp.broadcast_to(jnp.arange(npoint, dtype=jnp.int32),
                            (batch, npoint))


def eval_group_dtype(training: bool):
    """dpfj storage dtype for grouped neighborhoods in EVAL mode.

    ``ADAPTPOINT_TPU_EVAL_DPFJ=bf16`` halves the dominant HBM write of an
    SA stage — the lane-padded (B,K,M,128+) tensor — at activation-grade
    rounding (selection, centers and all training-path values stay f32);
    argmax-parity tested, worth ~1.9x eval throughput on TPU. The DEFAULT
    is f32 so eval accuracy and reference-parity comparisons are bit-exact
    unless the fast mode is explicitly requested (bench.py requests it)."""
    if training:
        return None
    from ..utils.precision import _OVERRIDE
    if _OVERRIDE.get() is not None:
        return jnp.bfloat16 if _OVERRIDE.get() == jnp.bfloat16 else None
    mode = os.environ.get("ADAPTPOINT_TPU_EVAL_DPFJ", "f32").lower()
    return jnp.bfloat16 if mode in ("bf16", "bfloat16") else None


def pad_query_idx(query_idx):
    """Pad the query axis up to a tile-friendly multiple for the Pallas
    gather-kernel family (ballgroup/saeval), which tiles M in sublane-
    aligned blocks — M with no multiple-of-8 divisor (e.g. S3DIS
    15000/4 = 3750) would otherwise force an illegal tile. Picks the
    largest power-of-two tile multiple costing <= 5% extra rows, with a
    multiple-of-8 floor. Pad rows repeat each cloud's first query index;
    their outputs are computed and sliced away by the caller.

    Returns (padded_idx, m_orig); m_orig is None when M is already
    8-aligned (caller skips the slice)."""
    import jax.numpy as jnp
    m = query_idx.shape[1]
    if m % 8 == 0:
        return query_idx, None
    target = m + (-m) % 8
    for mult in (256, 128, 64, 32, 16):
        p = (-m) % mult
        if p * 20 <= m:
            target = m + p
            break
    pad = jnp.broadcast_to(query_idx[:, :1],
                           (query_idx.shape[0], target - m))
    return jnp.concatenate([query_idx, pad], axis=1), m


def _ball_group_xla(radius, nsample, xyz, query_idx, feats,
                    relative=True, normalize_dp=False, out_dtype=None):
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
    if out_dtype is not None:
        dpfj = dpfj.astype(out_dtype)
    return new_xyz, fi, jnp.transpose(dpfj, (0, 2, 1, 3)), idx


def ball_group(radius, nsample, xyz, query_idx, feats,
               relative=True, normalize_dp=False, out_dtype=None,
               splits=None, grad_splits=None):
    """Fused center-gather + ball query + neighborhood grouping.

    Returns (new_xyz (B,M,3), fi (B,M,C), dpfj (B,K,M,3+C) fused [dp || fj],
    idx (B,M,K)). Pallas on TPU (ops/pallas/ballgroup.py), XLA elsewhere —
    bit-identical outputs. ``out_dtype=bf16`` halves the dpfj HBM write
    (eval/inference paths; see ball_group_pallas). ``splits``/``grad_splits``
    lower the Pallas value-gather / gradient-scatter precision per call
    (1 = bf16 values, exact selection) — the XLA fallback stays exact, so
    only tolerant consumers (the AdaptPoint controller) should set them.
    """
    import jax.numpy as jnp
    odt = out_dtype or jnp.float32
    # Kernel contract is f32-in: bf16 feats (bf16 compute policy) upcast at
    # entry — exactly representable, so ONE bf16 split already carries the
    # full value precision and the 3-split exact mode would be 3x wasted MXU
    # work. fi is returned in the caller's dtype so both dispatch branches
    # (and the bf16-policy consumers) agree.
    in_dt = feats.dtype
    if in_dt == jnp.bfloat16:
        feats = feats.astype(jnp.float32)
        if splits is None:
            splits = 1
        if grad_splits is None:
            grad_splits = 1  # cotangents are bf16-grade under the policy
        if out_dtype is None:
            # bf16-policy consumers cast dpfj to bf16 at the next matmul
            # anyway: emitting bf16 halves the dominant (B,K,M,3+C) HBM
            # write and deletes the convert copy (values are policy-grade
            # rounded either way; selection/idx stay exact)
            out_dtype = jnp.bfloat16
    # pallas tiles need M divisible by 8 (qidx sublane constraint); tiny
    # problems (B*M*K*N < PALLAS_WORK_MIN one-hot elements) go to XLA —
    # measured crossover: at B=4 N=128 M=64 the fused bwd loses to the XLA
    # composite (2.2 vs 1.5 ms) while every training shape is >=100x above
    # threshold (scripts/check_ballgroup.py)
    work = xyz.shape[0] * query_idx.shape[1] * nsample * xyz.shape[1]
    m_orig = None
    if work >= PALLAS_WORK_MIN:
        # tile-unfriendly M (no mult-of-8 divisor) rides the Pallas path
        # via padded queries; outputs are sliced back below
        query_idx, m_orig = pad_query_idx(query_idx)
    if query_idx.shape[1] % 8 == 0 and work >= PALLAS_WORK_MIN:
        def _pallas(xyz, query_idx, feats):
            return ball_group_pallas(radius, nsample, xyz, query_idx, feats,
                                     relative, normalize_dp, odt,
                                     splits, grad_splits)

        def _xla(xyz, query_idx, feats):
            return _ball_group_xla(radius, nsample, xyz, query_idx, feats,
                                   relative, normalize_dp, odt)

        out = _dispatch(_pallas, _xla, xyz, query_idx, feats)
    else:
        out = _ball_group_xla(radius, nsample, xyz, query_idx, feats,
                              relative, normalize_dp, odt)
    if m_orig is not None:
        new_xyz, fi, dpfj, idx = out
        out = (new_xyz[:, :m_orig], fi[:, :m_orig], dpfj[:, :, :m_orig],
               idx[:, :m_orig])
    if in_dt == jnp.bfloat16:
        new_xyz, fi, dpfj, idx = out
        return new_xyz, fi.astype(in_dt), dpfj, idx
    return out


def _ball_group_max_xla(radius, nsample, xyz, query_idx, feats):
    """XLA composite fallback for ball_group_max (CPU/tests)."""
    new_xyz = index_points(xyz, query_idx)
    fi = index_points(feats, query_idx)
    idx = ball_query_xla(radius, nsample, xyz, new_xyz)
    fj = index_points(feats, idx)  # (B,M,K,C)
    return new_xyz, fi, jnp.max(fj, axis=2), jnp.min(fj, axis=2)


def ball_group_max(radius, nsample, xyz, query_idx, feats,
                   splits=1, grad_splits=1):
    """Fused ball-group + per-channel MAX/MIN pool over the neighborhood.

    Returns (new_xyz (B,M,3), fi (B,M,C), fmax (B,M,C), fmin (B,M,C)) — the
    (B,K,M,C) grouped tensor never exists. Built for consumers that reduce
    the neighborhood immediately (the AdaptPoint controller's
    PointsetGrouper: monotone per-channel affine then max, so max/min of the
    raw values suffice). Pallas on TPU, XLA composite elsewhere. Gradient
    tie-break differs from the XLA composite only on pad-repeated neighbors
    (torch argmax semantics; see ops/pallas/ballgroup.py)."""
    # Same bf16-policy contract as ball_group: the kernel is f32-in, so
    # upcast at entry (exactly representable; one bf16 split carries full
    # precision) and return pooled features in the caller's dtype so both
    # lax.platform_dependent branches agree.
    import jax.numpy as jnp
    in_dt = feats.dtype
    if in_dt == jnp.bfloat16:
        feats = feats.astype(jnp.float32)
        splits = 1
        grad_splits = 1
    work = xyz.shape[0] * query_idx.shape[1] * nsample * xyz.shape[1]
    if query_idx.shape[1] % 8 == 0 and work >= PALLAS_WORK_MIN:
        from .pallas.ballgroup import ball_group_maxpool_pallas

        def _pallas(xyz, query_idx, feats):
            return ball_group_maxpool_pallas(radius, nsample, xyz,
                                             query_idx, feats, splits,
                                             grad_splits)

        def _xla(xyz, query_idx, feats):
            return _ball_group_max_xla(radius, nsample, xyz, query_idx,
                                       feats)

        out = _dispatch(_pallas, _xla, xyz, query_idx, feats)
    else:
        out = _ball_group_max_xla(radius, nsample, xyz, query_idx, feats)
    if in_dt == jnp.bfloat16:
        new_xyz, fi, fmax, fmin = out
        return (new_xyz, fi.astype(in_dt), fmax.astype(in_dt),
                fmin.astype(in_dt))
    return out


def fused_self_attention(q, k, v, scale: float):
    """softmax(q k^T / scale) v over (BH, N, d) flattened heads.

    Pallas flash-style kernel on TPU (ops/pallas/attention.py — the (N,N)
    logits never leave VMEM; the XLA one-shot path writes them to HBM, which
    is the entire cost at the controller's mask-head shape). XLA one-shot
    elsewhere. Both branches share the same numerics class: bf16 QK^T/AV
    matmuls, f32 softmax. Differentiable in both branches (custom flash
    VJP on the Pallas side). Requires N % 8 == 0 for the kernel; callers
    below that route to XLA anyway via the work threshold in the caller.
    """
    def _pallas(q, k, v):
        from .pallas.attention import mha_pallas
        return mha_pallas(q, k, v, scale)

    def _xla(q, k, v):
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / scale
        a = jax.nn.softmax(s, axis=-1)
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    return _dispatch(_pallas, _xla, q, k, v)
