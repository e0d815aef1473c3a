"""Micro-benchmark: tpu.dynamic_gather (via jnp.take_along_axis inside a
Pallas kernel) vs the one-hot MXU matmul gather, at the AdaptPoint row-gather
shapes.

Mosaic lowers jnp.take_along_axis on a 2D (R, C) operand with same-shape
indices to tpu.dynamic_gather (jax/_src/pallas/mosaic/lowering.py,
lax.gather_p rule).  Two layouts are probed:

  dim0: out[i, j] = x[idx[i, j], j]  — gather along sublanes
  dim1: out[i, j] = x[i, idx[i, j]]  — gather along lanes

The row gather we need everywhere (ballgroup/saeval/gather.py) is dim0 with
idx broadcast along lanes: out rows = table rows picked by a flat index
vector.  If this runs near VPU shuffle rate it replaces the one-hot build
(K*M*N*2 lane-ops) AND the N-wide gather matmul (B*K*M*N*C*2 FLOPs) with
moves proportional to the gathered bytes only.

Run on the real chip: python scripts/check_dyngather.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time(fn, *args, iters=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


# ---------------------------------------------------------------- dyn kernel
def _dyn_kernel(pts_ref, idx_ref, out_ref):
    # pts (1, N, C) | idx (1, R, C) i32 | out (1, R, C); R == N per chunk
    out_ref[0] = jnp.take_along_axis(pts_ref[0], idx_ref[0], axis=0)


def gather_rows_dyn(pts, idx):
    """pts (B, N, C), idx (B, M) -> (B, M, C) via chunked dynamic_gather."""
    b, n, c = pts.shape
    m = idx.shape[1]
    chunks = -(-m // n)
    m_pad = chunks * n
    idx_p = jnp.pad(idx, ((0, 0), (0, m_pad - m)))
    idx_b = jnp.broadcast_to(idx_p[:, :, None], (b, m_pad, c)).astype(jnp.int32)
    idx_b = idx_b.reshape(b * chunks, n, c)
    pts_r = jnp.repeat(pts, chunks, axis=0)
    out = pl.pallas_call(
        _dyn_kernel,
        grid=(b * chunks,),
        in_specs=[pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, n, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * chunks, n, c), pts.dtype),
    )(pts_r, idx_b)
    return out.reshape(b, m_pad, c)[:, :m]


# ------------------------------------------------------- fused in one kernel
def _dyn_kernel_fused(pts_ref, idx_ref, out_ref):
    # pts (1, N, C) | idx (1, M, C) | out (1, M, C): loop chunks inside
    n = pts_ref.shape[1]
    m = idx_ref.shape[1]
    pts = pts_ref[0]
    for s in range(0, m, n):
        out_ref[0, s:s + n] = jnp.take_along_axis(
            pts, idx_ref[0, s:s + n], axis=0)


def gather_rows_dyn_fused(pts, idx):
    b, n, c = pts.shape
    m = idx.shape[1]
    m_pad = -(-m // n) * n
    idx_p = jnp.pad(idx, ((0, 0), (0, m_pad - m)))
    idx_b = jnp.broadcast_to(idx_p[:, :, None], (b, m_pad, c)).astype(jnp.int32)
    out = pl.pallas_call(
        _dyn_kernel_fused,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, m_pad, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, m_pad, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, c), pts.dtype),
    )(pts, idx_b)
    return out[:, :m]


# ------------------------------------------------------------------ run
def main():
    from adaptpoint_tpu.ops.pallas.gather import gather_rows_pallas

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    for (b, n, c, m) in [(32, 2048, 128, 16384),   # enc1 K*M
                         (32, 2048, 128, 1200),    # phase-B resample
                         (32, 1024, 128, 8192),
                         (128, 1024, 128, 8192)]:
        pts = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, (b, m)), jnp.int32)
        ref = np.take_along_axis(np.asarray(pts), np.asarray(idx)[..., None], 1)

        for name, fn in [("dyn_chunked", gather_rows_dyn),
                         ("dyn_fused", gather_rows_dyn_fused),
                         ("onehot", functools.partial(gather_rows_pallas)),
                         ("xla", lambda p, i: jnp.take_along_axis(
                             p, i[..., None].astype(jnp.int32), 1))]:
            try:
                f = jax.jit(fn)
                out = np.asarray(f(pts, idx))
                ok = np.array_equal(out, ref)
                ms = _time(f, pts, idx)
                gbps = out.nbytes * 2 / ms / 1e6  # read+write
                print(f"B{b} N{n} C{c} M{m} {name:12s} {ms:7.3f} ms "
                      f"{gbps:7.1f} GB/s exact={ok}")
            except Exception as e:  # noqa
                print(f"B{b} N{n} C{c} M{m} {name:12s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
