"""Fused (flash-style) self-attention Pallas kernel for the AdaptPoint
controller's mask head.

The mask head runs multi-head self-attention over ALL N=2048 points with
head_dim 16 (adapt/augmentor.py AnchorSelfAttention; reference
generator_component4_15.py:434-480 materializes the (B,H,N,N) matrix).
The XLA one-shot path materializes the logits in HBM — at the training
protocol (B=32,H=4,N=2048) that is 4 GB f32 of traffic per direction and
measured 27.7 ms forward / 33.8 ms fwd+bwd, pure bandwidth. FLOPs are
trivial (0.5 GFLOP), so this kernel keeps every (TM,N) logits tile in VMEM
and never writes it out: measured speedup is bandwidth-ratio-sized.

Numerics match the XLA one-shot branch's class: bf16 QK^T and AV matmuls
with f32 accumulation and an f32 max-subtracted softmax. The backward is
the standard flash recompute: per query tile, rebuild the softmax from
q/k, then dv += P^T do, dP = do v^T, dS = P (dP - rowsum(dP P)) / scale,
dq = dS k, dk += dS^T q — dk/dv accumulate across query tiles with the
revisited-output-block pattern (same as ballgroup's backward).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mha_pallas"]


def _interpret() -> bool:
    """CPU-interpreter testing hook (pltpu.force_tpu_interpret_mode stalls
    under the axon TPU plugin, so tests set this env flag instead)."""
    import os
    return os.environ.get("ADAPTPOINT_TPU_PALLAS_INTERPRET", "0") == "1"


def _pick_tile(m: int, n: int, budget_bytes: int, n_bufs: int) -> int:
    """Largest TM dividing m whose n_bufs (TM, n) f32 buffers fit."""
    import os
    ov = os.environ.get("ADAPTPOINT_TPU_ATTN_TM")
    if ov:
        t = int(ov)
        while m % t != 0 and t > 1:  # clamp to a divisor of m: the grid is
            t //= 2                  # (bh, m // tm) and would drop rows
        return t
    for tm in (1024, 512, 256, 128, 64, 32, 16, 8):
        if m % tm == 0 and n_bufs * tm * n * 4 <= budget_bytes:
            return tm
    return 8


def _softmax_tile(q, k, scale):
    """(TM,d),(N,d) -> P (TM,N) f32 softmax'd logits, XLA-branch numerics."""
    s = lax.dot_general(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) / scale
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q (1,TM,d); k,v (1,N,d); o (1,TM,d)
    p = _softmax_tile(q_ref[0], k_ref[0], scale)
    o_ref[0] = jnp.dot(p.astype(jnp.bfloat16),
                       v_ref[0].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float):
    # grid (BH, M//TM): dq tiled; dk/dv revisited per-bh, accumulated over t
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    do = do_ref[0]
    p = _softmax_tile(q, k, scale)
    pb = p.astype(jnp.bfloat16)
    dob = do.astype(jnp.bfloat16)
    # dv += P^T do : contract TM  (f32 accumulate, cast to the ref dtype —
    # bf16 inputs see one rounding per revisit; N//TM is 2 at the mask-head
    # shape)
    dv_acc = lax.dot_general(pb, dob, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dv_ref[0] = (dv_ref[0].astype(jnp.float32)
                 + dv_acc).astype(dv_ref.dtype)
    # dP = do v^T : contract d
    dp = lax.dot_general(dob, v_ref[0].astype(jnp.bfloat16),
                         (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True)) / scale
    dsb = ds.astype(jnp.bfloat16)
    dq_ref[0] = jnp.dot(dsb, k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32
                        ).astype(dq_ref.dtype)
    dk_acc = lax.dot_general(dsb, q.astype(jnp.bfloat16),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk_ref[0] = (dk_ref[0].astype(jnp.float32)
                 + dk_acc).astype(dk_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mha_pallas(q, k, v, scale: float):
    """Self-attention softmax(q k^T / scale) v without HBM logits.

    q, k, v: (BH, N, d) f32 or bf16 (heads flattened into the leading
    dim; bf16 inputs skip the HBM convert copies — the kernel casts to
    bf16 for the matmuls either way, so the numerics class is identical).
    Returns (BH, N, d) f32. Requires N % 8 == 0.
    """
    return _mha_fwd(q, k, v, scale)[0]


_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _mha_call(q, k, v, scale):
    bh, n, d = q.shape
    tm = _pick_tile(n, n, 18 * 1024 * 1024, 2)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=float(scale)),
        grid=(bh, n // tm),
        in_specs=[
            pl.BlockSpec((1, tm, d), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, d), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(q, k, v)


def _mha_fwd(q, k, v, scale):
    return _mha_call(q, k, v, scale), (q, k, v)


def _mha_bwd(scale, res, do):
    q, k, v = res
    bh, n, d = q.shape
    # bwd holds p, dp, ds (3 f32 (TM,N) live tiles; the bf16 casts overlap)
    # — measured at the mask-head shape (BH=128, N=2048): tm=1024 compiles
    # under the raised 32M limit and runs 5.9 -> 3.8 ms vs tm=512
    tm = _pick_tile(n, n, 26 * 1024 * 1024, 3)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=float(scale)),
        grid=(bh, n // tm),
        in_specs=[
            pl.BlockSpec((1, tm, d), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, d), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, d), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n, d), v.dtype),
        ),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(q, k, v, do)
    return dq, dk, dv


mha_pallas.defvjp(_mha_fwd, _mha_bwd)
