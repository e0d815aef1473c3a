"""Row gather as one-hot MXU matmuls — Pallas TPU kernel with custom VJP.

XLA's take_along_axis row gather runs at ~10GB/s effective on TPU; this
kernel rebuilds it as (M-tile, N) one-hot x (N, C) matmuls with the exact
3-way bf16 split (bit-identical to the XLA gather; see ballgroup.py).
Used for the FPS point-budget resampling gather in the train step
(parity: train_autoaug.py:493-498).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ballgroup import _oh_matmul, _round_up, _split3, gather_splits


def _oh_matmul_s(oh_bf16, x, splits: int):
    """one-hot (T,N)bf16 @ (N,C) f32 via `splits`-way bf16 decomposition."""
    hi = x.astype(jnp.bfloat16)
    g = jnp.dot(oh_bf16, hi, preferred_element_type=jnp.float32)
    if splits >= 2:
        r1 = x - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        g += jnp.dot(oh_bf16, mid, preferred_element_type=jnp.float32)
        if splits >= 3:
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            g += jnp.dot(oh_bf16, lo, preferred_element_type=jnp.float32)
    return g

__all__ = ["gather_rows_pallas"]


def _fwd_kernel(pts_ref, idx_ref, out_ref, *, splits: int = 3):
    # pts (1,N,C) f32/bf16 | idx (1,1,TM) i32 | out (1,TM,C)
    _, n_pad, _ = pts_ref.shape
    tm = idx_ref.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    oh = (lane == idx_ref[0, 0][:, None]).astype(jnp.bfloat16)
    out_ref[0] = _oh_matmul_s(oh, pts_ref[0], splits).astype(out_ref.dtype)


def _bwd_kernel(idx_ref, g_ref, out_ref, *, splits: int = 3):
    # grid (B, M//TM); out (1,N,C) accumulated across t
    _, n_pad, _ = out_ref.shape
    tm = idx_ref.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    lane = lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    ohT = (lane == idx_ref[0, 0][:, None]).astype(jnp.bfloat16).T
    out_ref[0] = out_ref[0] + _oh_matmul_s(ohT, g_ref[0], splits)


def _fits(tm: int, n_pad: int, c_pad: int) -> bool:
    # one-hot (tm, n_pad) + double-buffered out (tm, c_pad) + pts (n_pad, c_pad)
    return (tm * n_pad * 4 + 2 * tm * c_pad * 4
            + n_pad * c_pad * 4) <= 10 * 1024 * 1024


def _pad_m(m: int) -> int:
    # Mosaic block rule: the idx tile's last dim must be a multiple of 128
    # or equal to M itself. Small M runs as one full block; larger M is
    # padded to a 128 multiple so 128/256/512 tiles divide it.
    return m if m <= 128 else _round_up(m, 128)


def _pick_tm(m_pad: int, n_pad: int, c_pad: int) -> int:
    tm = 512
    while tm >= 128:
        if m_pad % tm == 0 and _fits(tm, n_pad, c_pad):
            return tm
        tm //= 2
    return m_pad


def gather_fits(n: int, c: int, m: int) -> bool:
    """True if gather_rows_pallas can tile (B,N,C) x (B,M) within VMEM."""
    n_pad, c_pad = _round_up(n, 128), _round_up(c, 128)
    m_pad = _pad_m(m)
    return _fits(_pick_tm(m_pad, n_pad, c_pad), n_pad, c_pad)


@jax.custom_vjp
def gather_rows_pallas(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B,N,C) f32/bf16, idx (B,M) int -> (B,M,C), exact.

    bf16 values are exact with ONE split (they pass the 1.0 one-hot
    multipliers unchanged into the f32 accumulator)."""
    return _call_fwd(points, idx)


def _call_fwd(points, idx):
    B, N, C = points.shape
    M = idx.shape[1]
    n_pad = _round_up(N, 128)
    m_pad = _pad_m(M)
    tm = _pick_tm(m_pad, n_pad, _round_up(C, 128))
    if n_pad != N:
        points = jnp.pad(points, ((0, 0), (0, n_pad - N), (0, 0)))
    if m_pad != M:
        idx = jnp.pad(idx, ((0, 0), (0, m_pad - M)))
    splits = 1 if points.dtype == jnp.bfloat16 else gather_splits()
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, splits=splits),
        grid=(B, m_pad // tm),
        in_specs=[
            pl.BlockSpec((1, n_pad, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tm), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, C), points.dtype),
    )(points, idx.astype(jnp.int32)[:, None, :])
    return out[:, :M] if m_pad != M else out


def _fwd(points, idx):
    # dtype sentinel: custom_vjp residuals must be JAX values
    return _call_fwd(points, idx), (points.shape,
                                    jnp.zeros((), points.dtype), idx)


def _bwd(res, g):
    (b, n, c), pdt_sentinel, idx = res
    pdt = pdt_sentinel.dtype
    M = idx.shape[1]
    n_pad = _round_up(n, 128)
    m_pad = _pad_m(M)
    tm = _pick_tm(m_pad, n_pad, _round_up(c, 128))
    if m_pad != M:
        # padded idx rows point at row 0 but carry zero cotangent
        idx = jnp.pad(idx, ((0, 0), (0, m_pad - M)))
        g = jnp.pad(g, ((0, 0), (0, m_pad - M), (0, 0)))
    splits = 1 if g.dtype == jnp.bfloat16 else gather_splits()
    g_pts = pl.pallas_call(
        functools.partial(_bwd_kernel, splits=splits),
        grid=(b, m_pad // tm),
        in_specs=[
            pl.BlockSpec((1, 1, tm), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, c), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # scatter-accumulation stays f32 across tiles; cast to the primal
        # dtype only at the end (custom_vjp cotangent dtype contract)
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
    )(idx.astype(jnp.int32)[:, None, :], g)
    return g_pts[:, :n].astype(pdt), None


gather_rows_pallas.defvjp(_fwd, _bwd)
