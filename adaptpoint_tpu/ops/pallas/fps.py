"""Furthest point sampling as a Pallas TPU kernel.

Re-designs the reference CUDA FPS
(cpp/pointnet2_batch/src/sampling_gpu.cu:101-260) for the TPU: the whole batch
is processed vectorized per step (VPU lanes = points), the running min-distance
vector lives in VMEM across all ``npoint`` steps, and the selected coordinate
is extracted with a one-hot reduction instead of a gather (lane-dynamic loads
are slow on TPU). Semantics are identical: first index is 0, each step picks
the argmax of the running min-distance.

Batch rows are chunked over the (sequential, pipelined) Pallas grid so the
working set stays within VMEM for any B, N.

The selected index is stored per step at a DYNAMIC leading-dim offset of a
(npoint, 1, bb) output (Mosaic allows dynamic indexing on untiled leading
dims) — a full-width masked rewrite of the (bb, npoint) row per step costs
npoint/128 tiles of read+write traffic per step and dominated the kernel at
npoint >= ~1200; the dynamic store touches one (8,128) tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["furthest_point_sample_pallas"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(x_ref, out_ref, mind_ref, *, npoint: int, n_real: int):
    # x_ref: (1, BB, 3, Np) f32; out_ref: (1, npoint, 1, BB) i32;
    # mind_ref: (BB, Np) f32 scratch
    _, bb, _, n_pad = x_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, (bb, n_pad), 1)
    # padded lanes must never win the argmax
    mind_ref[:] = jnp.where(lane < n_real, jnp.float32(1e10), jnp.float32(-1e10))
    out_ref[0, 0] = jnp.zeros((1, bb), jnp.int32)  # first selected index is 0

    def body(j, last):
        # one-hot extract of the previously selected point's coordinates
        onehot = (lane == last[:, None]).astype(jnp.float32)  # (BB, Np)
        x = x_ref[0]  # (BB, 3, Np)
        sel = jnp.sum(x * onehot[:, None, :], axis=2, keepdims=True)  # (BB,3,1)
        d = jnp.sum((x - sel) ** 2, axis=1)  # (BB, Np)
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        # argmax via max + first-matching-lane (Mosaic can't legalize argmax;
        # first-occurrence tie-break matches jnp.argmax / the CUDA reduction)
        m = jnp.max(mind, axis=1, keepdims=True)
        cand = jnp.where(mind >= m, lane, jnp.int32(2 ** 30))
        nxt = jnp.min(cand, axis=1).astype(jnp.int32)  # (BB,)
        out_ref[0, pl.ds(j, 1)] = nxt[None, None, :]
        return nxt

    lax.fori_loop(1, npoint, body, jnp.zeros((bb,), jnp.int32))


@functools.partial(jax.jit, static_argnums=(1, 2))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """xyz (B, N, 3) -> idx (B, npoint) int32."""
    B, N, _ = xyz.shape
    if npoint == 1:
        return jnp.zeros((B, 1), jnp.int32)
    n_pad = _round_up(N, 128)
    x = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    if n_pad != N:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - N)))

    # chunk batch so (x + mind + out) stays well under VMEM (~16MB/core)
    per_row_bytes = (3 + 1) * n_pad * 4 + npoint * 4
    bb = max(1, min(B, (6 * 1024 * 1024) // per_row_bytes))
    while B % bb != 0:
        bb -= 1
    x = x.reshape(B // bb, bb, 3, n_pad)

    kernel = functools.partial(_fps_kernel, npoint=npoint, n_real=N)
    out = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[pl.BlockSpec((1, bb, 3, n_pad), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, npoint, 1, bb), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // bb, npoint, 1, bb), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bb, n_pad), jnp.float32)],
        interpret=interpret,
    )(x)
    # (B//bb, npoint, 1, bb) -> (B, npoint)
    return jnp.transpose(out[:, :, 0, :], (0, 2, 1)).reshape(B, npoint)
