"""Exact k-nearest-neighbors as a Pallas TPU kernel.

The XLA paths pay K full HBM passes over the (B,M,N) distance matrix
(iterative argmin) or a full sort (top_k) — at DGCNN shapes
(B=128, M=N=1024, k=20) that is ~10-20 GB of HBM traffic per kNN. Here the
(TM, N) distance tile stays RESIDENT IN VMEM across all K min-extraction
passes, so the selection costs VPU only.

Distance: expanded |q|^2+|x|^2-2qx with a 6-term bf16-split cross matmul
(~f32 accuracy, same class as the XLA HIGHEST-precision einsum in
ops/geometry.square_distance). Tie-breaking = lowest lane index (a second
min over lanes where d2 == min), matching stable top_k. The selected lane
index is extracted with the exact 2-split bf16 lane-column matmul trick
from ballgroup.py.

Parity: generic kNN (feature-space or xyz) per knn_point semantics
(generator_component4_15.py:61-72); consumers gather via ops.index_points.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn_pallas", "knn_fits"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split3(x):
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _knn_kernel(q_ref, x_ref, d_ref, i_ref, *, k: int, n_real: int):
    # q_ref (1,TM,C) f32 queries | x_ref (1,N,C) f32 support
    # outs: d (1,TM,k) f32 squared distances, i (1,TM,k) i32
    tm = q_ref.shape[1]
    n_pad = x_ref.shape[1]
    q = q_ref[0]
    x = x_ref[0]
    q_hi, q_mid, q_lo = _split3(q)
    x_hi, x_mid, x_lo = _split3(x)
    cross = jnp.dot(q_hi, x_hi.T, preferred_element_type=jnp.float32)
    cross += jnp.dot(q_hi, x_mid.T, preferred_element_type=jnp.float32)
    cross += jnp.dot(q_mid, x_hi.T, preferred_element_type=jnp.float32)
    cross += jnp.dot(q_lo, x_hi.T, preferred_element_type=jnp.float32)
    cross += jnp.dot(q_hi, x_lo.T, preferred_element_type=jnp.float32)
    cross += jnp.dot(q_mid, x_mid.T, preferred_element_type=jnp.float32)
    d2 = (jnp.sum(q * q, axis=1, keepdims=True)
          + jnp.sum(x * x, axis=1)[None, :] - 2.0 * cross)  # (TM, N)

    lane = lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    BIG = jnp.float32(jnp.inf)
    d2 = jnp.where(lane < n_real, d2, BIG)
    kcol = lax.broadcasted_iota(jnp.int32, (tm, k), 1)

    dacc = jnp.zeros((tm, k), jnp.float32)
    iacc = jnp.zeros((tm, k), jnp.int32)
    for kk in range(k):
        val = jnp.min(d2, axis=1, keepdims=True)  # (TM,1)
        # first-occurrence tie-break: smallest lane among the minima
        sel = jnp.min(jnp.where(d2 == val, lane, jnp.int32(2 ** 30)),
                      axis=1, keepdims=True)  # (TM,1)
        dacc = jnp.where(kcol == kk, val, dacc)
        iacc = jnp.where(kcol == kk, sel, iacc)
        d2 = jnp.where(lane == sel, BIG, d2)
    d_ref[0] = dacc
    i_ref[0] = iacc


def knn_fits(n: int, c: int, k: int) -> bool:
    """VMEM feasibility: support block + d2 tile must fit ~10MB."""
    n_pad = _round_up(n, 128)
    c_pad = _round_up(c, 128)
    fixed = 2 * n_pad * c_pad * 4  # x block dbl-buffered
    tile = 128 * n_pad * 4 * 2  # d2 + masks at the smallest useful tile
    return fixed + tile <= 10 * 1024 * 1024 and k <= 128


@functools.partial(jax.jit, static_argnums=(0,))
def knn_pallas(k: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray):
    """(d2, idx) of the k nearest support points (xyz) for each query
    (new_xyz); both (B, M, k). Same result contract as geometry.knn_point."""
    B, N, C = xyz.shape
    M = new_xyz.shape[1]
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 128)
    budget = 10 * 1024 * 1024
    fixed = 2 * n_pad * c_pad * 4
    tm = 256
    while tm > 8 and fixed + tm * n_pad * 4 * 3 + 2 * tm * c_pad * 4 > budget:
        tm //= 2
    while M % tm != 0 and tm > 1:
        tm //= 2
    xp = jnp.pad(xyz, ((0, 0), (0, n_pad - N), (0, 0))) if n_pad != N else xyz
    kernel = functools.partial(_knn_kernel, k=k, n_real=N)
    d2, idx = pl.pallas_call(
        kernel,
        grid=(B, M // tm),
        in_specs=[
            pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, k), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, k), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, k), jnp.float32),
            jax.ShapeDtypeStruct((B, M, k), jnp.int32),
        ),
    )(new_xyz, xp)
    return d2, idx
