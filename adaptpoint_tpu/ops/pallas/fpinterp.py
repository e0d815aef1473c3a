"""Fused 3-NN weighted interpolation gather — Pallas TPU kernel, custom VJP.

The composite `three_interpolation` path (ops/__init__.py) gathers the
(B, N*3, C) neighbor rows, multiplies by the interpolation weights and
sums: at the augmentor's FP-decode shapes every level materializes a
~100 MB intermediate forward AND a same-sized weight broadcast backward
(the profiler attributed ~6.9 ms/step of the gan_step to the four FP
levels). FLOP-wise the one-hot gather matmul is also 3x larger than
needed: the weighted sum can ride the one-hot itself.

This kernel folds the weights into the one-hot before the MXU:

    woh[n, m] = sum_j  w[n, j] * [idx[n, j] == m]          (TM, M)
    out_tile  = woh @ feat                                  (TM, C)

so the gather, the weighting and the sum are ONE matmul of 1/3 the
composite's FLOPs, and nothing bigger than the (B, N, C) result ever
touches HBM. The backward is two matmuls per tile (d_feat = woh^T g
accumulated across tiles, dW = g feat^T from which the three d_w columns
are masked out) — no scatter, no broadcast.

Precision: values must be bf16 (the GAN compute policy's activations) so
each product w_split * feat is exact in the f32 accumulator; the f32
weights are applied as a 2-way bf16 split (hi + residual), leaving only
the ~2^-16-relative second-residual truncation vs the composite's f32
multiply. f32 features keep the composite path (exactness there is a
parity requirement for the seg decoders).

Parity: same (feat, idx, w) contract as the composite weighted sum in
ops.three_interpolation (reference three_interpolate,
cpp/pointnet2_batch/src/interpolate_gpu.cu); idx carries no gradient.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["weighted_gather3", "weighted_gather3_fits"]

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _interpret() -> bool:
    return os.environ.get("ADAPTPOINT_TPU_PALLAS_INTERPRET", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _build_woh(idx_ref, w_ref, tm: int, m_pad: int):
    """(TM, M) weighted one-hot in f32 + its 2-way bf16 split."""
    lane = lax.broadcasted_iota(jnp.int32, (tm, m_pad), 1)
    woh = jnp.zeros((tm, m_pad), jnp.float32)
    for j in range(3):
        woh += jnp.where(lane == idx_ref[0, j][:, None],
                         w_ref[0, j][:, None], 0.0)
    hi = woh.astype(jnp.bfloat16)
    lo = (woh - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return lane, hi, lo


def _fwd_kernel(feat_ref, idx_ref, w_ref, out_ref):
    # feat (1, M, C) bf16 | idx/w (1, 3, TM) | out (1, TM, C) f32
    m_pad = feat_ref.shape[1]
    tm = idx_ref.shape[-1]
    _, hi, lo = _build_woh(idx_ref, w_ref, tm, m_pad)
    feat = feat_ref[0]
    out = jnp.dot(hi, feat, preferred_element_type=jnp.float32)
    out += jnp.dot(lo, feat, preferred_element_type=jnp.float32)
    out_ref[0] = out


def _bwd_kernel(feat_ref, idx_ref, w_ref, g_ref, dfeat_ref, dw_ref):
    # grid (B, N//TM): dfeat (1, M, C) revisited per-b, accumulated over t
    m_pad = feat_ref.shape[1]
    tm = idx_ref.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

    lane, hi, lo = _build_woh(idx_ref, w_ref, tm, m_pad)
    g = g_ref[0]
    gb = g.astype(jnp.bfloat16)
    # d_feat += woh^T g : contract TM
    acc = lax.dot_general(hi, gb, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    acc += lax.dot_general(lo, gb, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
    dfeat_ref[0] = dfeat_ref[0] + acc
    # dW = g feat^T : contract C -> (TM, M); d_w_j = dW at idx_j
    dW = lax.dot_general(gb, feat_ref[0], (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dw = jnp.zeros((3, tm), jnp.float32)
    krow = lax.broadcasted_iota(jnp.int32, (3, tm), 0)
    for j in range(3):
        dj = jnp.sum(jnp.where(lane == idx_ref[0, j][:, None], dW, 0.0),
                     axis=1)
        dw = jnp.where(krow == j, dj[None, :], dw)
    dw_ref[0] = dw


def _pick_tm(n: int, m_pad: int, c_pad: int) -> int:
    # woh f32 + 2 bf16 splits (3x tm*m_pad*4 worst case) + g/out tiles
    budget = 12 * 1024 * 1024
    for tm in (512, 256, 128, 64, 32, 16, 8):
        if n % tm == 0 and tm * m_pad * 12 + 3 * tm * c_pad * 4 <= budget:
            return tm
    return 0


def weighted_gather3_fits(n: int, m: int, c: int) -> bool:
    """Shape feasibility of the fused kernel (bf16 features only)."""
    if m % 128 != 0 or c % 128 != 0:
        return False
    fixed = 2 * m * c * 2  # double-buffered feat block
    tm = _pick_tm(n, m, c)
    return tm >= 8 and fixed + tm * m * 12 <= 14 * 1024 * 1024


@jax.custom_vjp
def weighted_gather3(feat: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray):
    """sum_j feat[b, idx[b, n, j], :] * w[b, n, j] -> (B, N, C).

    feat (B, M, C) bf16, idx (B, N, 3) int32 in [0, M), w (B, N, 3) f32.
    Returns f32 (the composite's weighted sum is f32 too; callers cast).
    """
    return _call_fwd(feat, idx, w)


def _prep(idx, w):
    # (B, N, 3) -> (B, 3, N) so the tile's lane dim is N
    return (jnp.transpose(idx, (0, 2, 1)).astype(jnp.int32),
            jnp.transpose(w, (0, 2, 1)).astype(jnp.float32))


def _call_fwd(feat, idx, w):
    B, M, C = feat.shape
    N = idx.shape[1]
    tm = _pick_tm(N, M, C)
    idx_t, w_t = _prep(idx, w)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, N // tm),
        in_specs=[
            pl.BlockSpec((1, M, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(feat, idx_t, w_t)


def _fwd(feat, idx, w):
    return _call_fwd(feat, idx, w), (feat, idx, w)


def _bwd(res, g):
    feat, idx, w = res
    B, M, C = feat.shape
    N = idx.shape[1]
    tm = _pick_tm(N, M, C)
    idx_t, w_t = _prep(idx, w)
    dfeat, dw_t = pl.pallas_call(
        _bwd_kernel,
        grid=(B, N // tm),
        in_specs=[
            pl.BlockSpec((1, M, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, M, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, N), jnp.float32),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(feat, idx_t, w_t, g.astype(jnp.float32))
    dw = jnp.transpose(dw_t, (0, 2, 1)).astype(w.dtype)
    return dfeat.astype(feat.dtype), None, dw


weighted_gather3.defvjp(_fwd, _bwd)
