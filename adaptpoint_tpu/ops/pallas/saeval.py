"""Fused eval-mode SetAbstraction stage: ball-group + folded-BN MLP +
max-pool in one Pallas kernel — the grouped (B,K,M,3+C) tensor and both
intermediate MLP activations never touch HBM.

This is the round-3 roadmap lever "eval-fused SA (BN folded, dpfj never
hits HBM)" for the frozen feedback classifier inside the GAN step and for
plain inference (reference SA stage: openpoints/models/backbone/
pointnext.py:81-170 = ball_query + grouping + shared-MLP + max, each a
separate CUDA kernel with HBM round-trips between them).

Selection (ball query, pad-with-first, empty-ball lane 0) is IDENTICAL to
ops/pallas/ballgroup.py — same rank-based k-parallel machinery. Values:
the neighbor gather runs at ``splits`` bf16 parts (default 1) and the two
conv matmuls run bf16-in/f32-accum — activation-grade rounding, the same
class as the gan bf16 compute policy that gates this path. BN is folded
into the conv weights by the caller (eval BN is a per-channel affine).

Forward-only: no custom VJP. Callers gate on a no-gradient context
(models/layers ``fused_eval``) — the differentiated fake-cloud feedback
pass keeps the plain differentiable path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ballgroup import (_COMPILER_PARAMS, _round_up, _search_tiles, _split3,
                        _oh_matmul)

__all__ = ["sa_eval_pallas", "sa_train_pallas"]


def _pick_tm_g(m, n_pad, w_pad, mid_pad, cout_pad, fixed_bytes, nsample):
    """(tile, g_batch) under the VMEM budget, modeling the MLP buffers.
    Same round-3 recalibration as ballgroup._pick_tm_g (bf16 one-hot +
    compare temp ~3B/elem; the old 7B estimate forced tiny low-utilization
    tiles). g must divide nsample: the kernel's k-loop is ``range(0, K, G)``
    and a non-divisor would overrun K, silently max-pooling neighbors past
    the ball-query cap. ``ADAPTPOINT_TPU_SAEVAL_TILE=tm,g`` overrides."""
    budget = 24 * 1024 * 1024

    def fits(tm, g):
        work = tm * n_pad * 12                     # d2/rank/mask/iota
        sel = g * tm * n_pad * 3                   # bf16 one-hot + compare
        mlp = g * tm * (w_pad + mid_pad + cout_pad) * 4 + tm * cout_pad * 4
        out_tiles = 2 * tm * (3 * 128 + w_pad + cout_pad) * 4
        return fixed_bytes + work + sel + mlp + out_tiles <= budget

    # g=4 first: measured best on the full fused-eval inference forward
    # (B=128 PointNeXt-S sweep: (256,4) 16.4k > (256,8) 15.4k > (128,8)
    # 13.2k clouds/s — the smaller stacked one-hot overlaps better)
    return _search_tiles(m, fits, (4, 8, 2, 1), nsample,
                         "ADAPTPOINT_TPU_SAEVAL_TILE")


def _sa_eval_kernel(qidx_ref, vcat_ref, xyzt_ref, xyz_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, newxyz_ref, fi_ref, out_ref, *,
                    radius: float, nsample: int, n_real: int, c: int,
                    relative: bool, normalize_dp: bool, splits: int,
                    g_batch: int, sx: int):
    # qidx (1,TM,1) i32;
    # vcat (1,N,3*sx + splits*C) bf16 — xyz bf16 splits PACKED ahead of the
    #   feature splits so ONE one-hot matmul per k-group gathers both (the
    #   xyz columns ride the same 128-lane pad the features already pay for
    #   at C<=122; a separate xcat matmul doubled the dominant MXU cost);
    # xyzt (1,3,N) f32; xyz (1,N,3) f32;
    # w1 (w=3+C, mid) bf16  b1 (1, mid) f32   [BN1 folded, relu follows]
    # w2 (mid, cout) bf16   b2 (1, cout) f32  [BN2 folded, NO act]
    # outs: newxyz (1,TM,3) f32, fi (1,TM,C) f32, out (1,TM,cout) f32
    n_pad = vcat_ref.shape[1]
    tm = qidx_ref.shape[1]
    K = nsample
    G = g_batch
    w = c + 3

    lane = lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)

    x_hi, x_mid, x_lo = _split3(xyz_ref[0])
    oh_q = (lane == qidx_ref[0, :, 0][:, None]).astype(jnp.bfloat16)
    q = _oh_matmul(oh_q, x_hi, x_mid, x_lo)  # (TM,3)
    newxyz_ref[0] = q

    xt = xyzt_ref[0]
    dx = q[:, 0:1] - xt[0:1, :]
    dy = q[:, 1:2] - xt[1:2, :]
    dz = q[:, 2:3] - xt[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz
    inball = (d2 < jnp.float32(radius) ** 2) & (lane < n_real)

    from .ballgroup import _inball_rank
    rank, count = _inball_rank(inball, tm, n_pad)
    ranked = jnp.where(inball, rank, 0)
    oh_first = (ranked == 1).astype(jnp.int32)
    oh_first = jnp.where(count > 0, oh_first, (lane == 0).astype(jnp.int32))

    vcat = vcat_ref[0]  # (N, 3*sx + splits*C) bf16
    fo = 3 * sx  # feature column offset

    # center features (skip connection input)
    rq = jnp.dot(oh_q, vcat, preferred_element_type=jnp.float32)
    rq_sum = rq[:, fo:fo + c]
    for _s in range(1, splits):
        rq_sum = rq_sum + rq[:, fo + _s * c:fo + (_s + 1) * c]
    fi_ref[0] = rq_sum

    # dp column placement: wide (TM, w) row with q broadcast into cols 0..2
    colw = lax.broadcasted_iota(jnp.int32, (1, w), 1)
    dp_scale = jnp.float32(1.0 / radius) if (relative and normalize_dp) \
        else jnp.float32(1.0)
    scale_row = jnp.where(colw < 3, dp_scale, jnp.float32(1.0))
    if relative:
        q_wide = (jnp.where(colw == 0, q[:, 0:1], 0.0)
                  + jnp.where(colw == 1, q[:, 1:2], 0.0)
                  + jnp.where(colw == 2, q[:, 2:3], 0.0))

    w1 = w1_ref[:]  # (w, mid) bf16
    b1 = b1_ref[:]  # (1, mid) f32
    w2 = w2_ref[:]  # (mid, cout) bf16
    b2 = b2_ref[:]  # (1, cout) f32
    cout = w2.shape[1]

    out_max = jnp.full((tm, cout), -jnp.inf, jnp.float32)

    # the xyz bf16 splits are packed into vcat's leading 3*sx columns, so
    # ONE one-hot matmul per k-group gathers coordinates AND features (dp
    # is consumed by the bf16 MLP — two bf16 splits carry it to activation
    # grade; new_xyz above is the only f32-exact coordinate output).
    # Empty slots leave the one-hot all-zero and the pad-with-first
    # fallback is applied to the GATHERED (TM, w) rows — one broadcast
    # compare + one convert per k-group instead of per-slot select chains
    # over (TM, N) (the kernel's VPU bottleneck).
    rf = jnp.dot(oh_first.astype(jnp.bfloat16), vcat,
                 preferred_element_type=jnp.float32)  # (TM, cols)
    gf_feat = rf[:, fo:fo + c]
    for _s in range(1, splits):
        gf_feat = gf_feat + rf[:, fo + _s * c:fo + (_s + 1) * c]
    gf_xyz = rf[:, 0:3]
    for _s in range(1, sx):
        gf_xyz = gf_xyz + rf[:, _s * 3:(_s + 1) * 3]
    gg_f = jnp.concatenate([gf_xyz, gf_feat], axis=1)  # (TM, w)
    for k0 in range(0, K, G):
        kvals = (k0 + 1
                 + lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0))
        ohb = (ranked[None] == kvals).astype(jnp.bfloat16).reshape(
            G * tm, n_pad)
        r = jnp.dot(ohb, vcat, preferred_element_type=jnp.float32)
        gfeat = r[:, fo:fo + c]
        for _s in range(1, splits):
            gfeat = gfeat + r[:, fo + _s * c:fo + (_s + 1) * c]
        gxyz = r[:, 0:3]
        for _s in range(1, sx):
            gxyz = gxyz + r[:, _s * 3:(_s + 1) * 3]
        # (G*TM, w) = [dp || fj], dp relative+scaled
        gg = jnp.concatenate([gxyz, gfeat], axis=1)
        # pad-with-first on the gathered rows (cheap (TM, w) selects)
        pieces = [jnp.where(count > (k0 + gi),
                            gg[gi * tm:(gi + 1) * tm], gg_f)
                  for gi in range(G)]
        gg = jnp.concatenate(pieces, axis=0) if G > 1 else pieces[0]
        if relative:
            gg = (gg - jnp.concatenate([q_wide] * G, axis=0)
                  if G > 1 else gg - q_wide) * scale_row
        h = jnp.dot(gg.astype(jnp.bfloat16), w1,
                    preferred_element_type=jnp.float32) + b1
        h = jnp.maximum(h, 0.0)
        o = jnp.dot(h.astype(jnp.bfloat16), w2,
                    preferred_element_type=jnp.float32) + b2
        for gi in range(G):
            out_max = jnp.maximum(out_max, o[gi * tm:(gi + 1) * tm])
    out_ref[0] = out_max


def _sa_prep(xyz, query_idx, feats, w1, w2, splits: int, nsample: int,
             bwd_acc: bool = True):
    """Shared fwd/bwd packing + tile pick (the backward must replay the
    forward's exact tile/arithmetic configuration so the recomputed
    per-slot outputs bit-match the saved max for the argmax mask).
    ``bwd_acc=False`` drops the backward-accumulator VMEM reservation for
    the forward-only eval path (the only term that differed between this
    and the hand-copied variant sa_eval_pallas used to carry)."""
    B, N, _ = xyz.shape
    M = query_idx.shape[1]
    C = feats.shape[-1]
    mid = w1.shape[1]
    cout = w2.shape[1]
    n_pad = _round_up(N, 128)

    parts = [jax.lax.optimization_barrier(feats.astype(jnp.bfloat16))]
    if splits >= 2:
        r1 = feats - parts[0].astype(jnp.float32)
        parts.append(jax.lax.optimization_barrier(r1.astype(jnp.bfloat16)))
        if splits >= 3:
            parts.append(jax.lax.optimization_barrier(
                (r1 - parts[1].astype(jnp.float32)).astype(jnp.bfloat16)))
    sx = max(splits, 2)
    x_parts = [jax.lax.optimization_barrier(xyz.astype(jnp.bfloat16))]
    xr = xyz - x_parts[0].astype(jnp.float32)
    x_parts.append(jax.lax.optimization_barrier(xr.astype(jnp.bfloat16)))
    if sx >= 3:
        x_parts.append(jax.lax.optimization_barrier(
            (xr - x_parts[1].astype(jnp.float32)).astype(jnp.bfloat16)))
    vcat = jnp.concatenate(x_parts + parts, axis=-1)

    w_pad = _round_up(C + 3, 128)
    # reserve the backward's extra blocks in the shared pick: the (n_pad,
    # 3+C) gradient accumulator + param-grad accumulators
    fixed = (n_pad * _round_up(vcat.shape[-1], 128) * 2       # vcat bf16
             + 8 * n_pad * 4 + n_pad * 128 * 4                # xyzt + xyz
             + (C + 3) * _round_up(mid, 128) * 2               # w1 bf16
             + mid * _round_up(cout, 128) * 2)                 # w2 bf16
    if bwd_acc:
        fixed += 2 * n_pad * w_pad * 4                         # bwd acc
    tm, g_batch = _pick_tm_g(M, n_pad, w_pad, _round_up(mid, 128),
                             _round_up(cout, 128), fixed, nsample)
    if n_pad != N:
        xyz_p = jnp.pad(xyz, ((0, 0), (0, n_pad - N), (0, 0)))
        vcat = jnp.pad(vcat, ((0, 0), (0, n_pad - N), (0, 0)))
    else:
        xyz_p = xyz
    xyzt = jnp.transpose(xyz_p, (0, 2, 1))
    return vcat, xyz_p, xyzt, n_pad, sx, tm, g_batch


def sa_eval_pallas(radius: float, nsample: int, xyz, query_idx, feats,
                   w1, b1, w2, b2, relative: bool = True,
                   normalize_dp: bool = False, splits: int = 1):
    """Fused eval SA stage. Forward-only (see module docstring).

    xyz (B,N,3) f32; query_idx (B,M) i32; feats (B,N,C) f32;
    w1 (3+C, mid), b1 (mid,), w2 (mid, cout), b2 (cout,) — BN pre-folded.
    Returns (new_xyz (B,M,3), fi (B,M,C), out (B,M,cout)) with
    out = max_k w2 @ relu(w1 @ [dp||fj] + b1) + b2.
    """
    B, N, _ = xyz.shape
    M = query_idx.shape[1]
    C = feats.shape[-1]
    K = nsample
    mid = w1.shape[1]
    cout = w2.shape[1]
    vcat, xyz_p, xyzt, n_pad, sx, tm, g_batch = _sa_prep(
        xyz, query_idx, feats, w1, w2, splits, nsample, bwd_acc=False)

    kernel = functools.partial(
        _sa_eval_kernel, radius=float(radius), nsample=K, n_real=N, c=C,
        relative=relative, normalize_dp=normalize_dp, splits=splits,
        g_batch=g_batch, sx=sx)
    new_xyz, fi, out = pl.pallas_call(
        kernel,
        grid=(B, M // tm),
        in_specs=[
            pl.BlockSpec((1, tm, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, vcat.shape[-1]), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C + 3, mid), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mid, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, cout), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, M, C), jnp.float32),
            jax.ShapeDtypeStruct((B, M, cout), jnp.float32),
        ),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(query_idx.astype(jnp.int32)[:, :, None], vcat, xyzt, xyz_p,
      w1.astype(jnp.bfloat16), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(jnp.bfloat16), b2.reshape(1, -1).astype(jnp.float32))
    return new_xyz, fi, out


def _interpret() -> bool:
    import os
    return os.environ.get("ADAPTPOINT_TPU_PALLAS_INTERPRET", "0") == "1"


# ---------------------------------------------------------------------------
# Differentiable fused SA stage (round 3): the same ball-group + folded-BN
# MLP + max-pool forward, with a custom VJP whose backward RECOMPUTES the
# selection and grouped activations tile-by-tile in VMEM and scatters the
# input gradients through transposed one-hot matmuls — the (B,K,M,3+C)
# grouped tensor never exists in EITHER direction. Built for the GAN step's
# differentiated fake-cloud feedback pass (frozen classifier, eval-mode BN
# folded by the caller), but the VJP also produces the true w1/b1/w2/b2
# cotangents so the op is generally correct.
#
# Max-pool gradient tie-break: FIRST maximal slot per output channel
# (torch.max argmax semantics — the same class ball_group_maxpool_pallas
# documents); the recomputed per-slot outputs bit-match the forward because
# the backward reuses the forward's exact tile/arithmetic configuration.
# ---------------------------------------------------------------------------


def _sa_bwd_kernel(qidx_ref, vcat_ref, xyzt_ref, xyz_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, out_ref, gout_ref, gfi_ref, gnew_ref,
                   gfx_ref, *wrefs, radius: float, nsample: int,
                   n_real: int, c: int, relative: bool, normalize_dp: bool,
                   splits: int, g_batch: int, sx: int, wgrads: bool):
    # grid (B, M//TM): gfx (1,N,3+C) revisited per-b (accumulate over t);
    # gw*/gb* revisited over the WHOLE grid (accumulate over b and t).
    # wgrads=False (frozen-classifier fake pass) drops the weight-cotangent
    # outputs and their accumulation matmuls statically.
    if wgrads:
        gw1_ref, gb1_ref, gw2_ref, gb2_ref = wrefs
    n_pad = vcat_ref.shape[1]
    tm = qidx_ref.shape[1]
    K = nsample
    G = g_batch
    w = c + 3

    @pl.when(pl.program_id(1) == 0)
    def _init_fx():
        gfx_ref[0] = jnp.zeros_like(gfx_ref[0])

    if wgrads:
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init_w():
            gw1_ref[:] = jnp.zeros_like(gw1_ref[:])
            gb1_ref[:] = jnp.zeros_like(gb1_ref[:])
            gw2_ref[:] = jnp.zeros_like(gw2_ref[:])
            gb2_ref[:] = jnp.zeros_like(gb2_ref[:])

    lane = lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    x_hi, x_mid, x_lo = _split3(xyz_ref[0])
    oh_q = (lane == qidx_ref[0, :, 0][:, None]).astype(jnp.bfloat16)
    q = _oh_matmul(oh_q, x_hi, x_mid, x_lo)

    xt = xyzt_ref[0]
    dx = q[:, 0:1] - xt[0:1, :]
    dy = q[:, 1:2] - xt[1:2, :]
    dz = q[:, 2:3] - xt[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz
    inball = (d2 < jnp.float32(radius) ** 2) & (lane < n_real)

    from .ballgroup import _inball_rank
    rank, count = _inball_rank(inball, tm, n_pad)
    ranked = jnp.where(inball, rank, 0)
    oh_first_i = (ranked == 1).astype(jnp.int32)
    oh_first_i = jnp.where(count > 0, oh_first_i,
                           (lane == 0).astype(jnp.int32))
    ohfb = oh_first_i.astype(jnp.bfloat16)

    vcat = vcat_ref[0]
    fo = 3 * sx

    colw = lax.broadcasted_iota(jnp.int32, (1, w), 1)
    dp_scale = jnp.float32(1.0 / radius) if (relative and normalize_dp) \
        else jnp.float32(1.0)
    scale_row = jnp.where(colw < 3, dp_scale, jnp.float32(1.0))
    if relative:
        q_wide = (jnp.where(colw == 0, q[:, 0:1], 0.0)
                  + jnp.where(colw == 1, q[:, 1:2], 0.0)
                  + jnp.where(colw == 2, q[:, 2:3], 0.0))

    w1 = w1_ref[:]
    b1 = b1_ref[:]
    w2 = w2_ref[:]
    b2 = b2_ref[:]
    cout = w2.shape[1]
    out = out_ref[0]                        # (TM, cout) saved forward max
    g_out = gout_ref[0].astype(jnp.float32)

    rf = jnp.dot(ohfb, vcat, preferred_element_type=jnp.float32)
    gf_feat = rf[:, fo:fo + c]
    for _s in range(1, splits):
        gf_feat = gf_feat + rf[:, fo + _s * c:fo + (_s + 1) * c]
    gf_xyz = rf[:, 0:3]
    for _s in range(1, sx):
        gf_xyz = gf_xyz + rf[:, _s * 3:(_s + 1) * 3]
    gg_f = jnp.concatenate([gf_xyz, gf_feat], axis=1)

    matched = jnp.zeros((tm, cout), jnp.float32)
    acc = jnp.zeros_like(gfx_ref[0])        # (N, 3+C) f32
    gdp_sum = jnp.zeros((tm, 3), jnp.float32)
    acc_w1 = jnp.zeros(w1.shape, jnp.float32)
    acc_b1 = jnp.zeros((1, w1.shape[1]), jnp.float32)
    acc_w2 = jnp.zeros(w2.shape, jnp.float32)
    acc_b2 = jnp.zeros((1, cout), jnp.float32)
    dn0 = (((0,), (0,)), ((), ()))          # contract dim 0 (rows)

    for k0 in range(0, K, G):
        kvals = (k0 + 1
                 + lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0))
        ohb = (ranked[None] == kvals).astype(jnp.bfloat16).reshape(
            G * tm, n_pad)
        # === exact replay of the forward's per-slot compute ===
        r = jnp.dot(ohb, vcat, preferred_element_type=jnp.float32)
        gfeat = r[:, fo:fo + c]
        for _s in range(1, splits):
            gfeat = gfeat + r[:, fo + _s * c:fo + (_s + 1) * c]
        gxyz = r[:, 0:3]
        for _s in range(1, sx):
            gxyz = gxyz + r[:, _s * 3:(_s + 1) * 3]
        gg = jnp.concatenate([gxyz, gfeat], axis=1)
        pieces = [jnp.where(count > (k0 + gi),
                            gg[gi * tm:(gi + 1) * tm], gg_f)
                  for gi in range(G)]
        gg = jnp.concatenate(pieces, axis=0) if G > 1 else pieces[0]
        if relative:
            gg = (gg - jnp.concatenate([q_wide] * G, axis=0)
                  if G > 1 else gg - q_wide) * scale_row
        ggb = gg.astype(jnp.bfloat16)
        h_pre = jnp.dot(ggb, w1, preferred_element_type=jnp.float32) + b1
        h = jnp.maximum(h_pre, 0.0)
        hb = h.astype(jnp.bfloat16)
        o = jnp.dot(hb, w2, preferred_element_type=jnp.float32) + b2

        # === first-maximal-slot mask (sequential over slots) ===
        masks = []
        for gi in range(G):
            ok = o[gi * tm:(gi + 1) * tm]
            mk = jnp.where((ok == out) & (matched == 0.0),
                           jnp.float32(1.0), jnp.float32(0.0))
            matched = matched + mk
            masks.append(mk)
        mask = jnp.concatenate(masks, axis=0) if G > 1 else masks[0]
        g_o = (jnp.concatenate([g_out] * G, axis=0)
               if G > 1 else g_out) * mask
        g_ob = g_o.astype(jnp.bfloat16)
        if wgrads:
            acc_w2 += lax.dot_general(hb, g_ob, dn0,
                                      preferred_element_type=jnp.float32)
            acc_b2 += jnp.sum(g_o, axis=0, keepdims=True)
        g_h = lax.dot_general(
            g_ob, w2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        g_h = jnp.where(h_pre > 0.0, g_h, 0.0)
        g_hb = g_h.astype(jnp.bfloat16)
        if wgrads:
            acc_w1 += lax.dot_general(ggb, g_hb, dn0,
                                      preferred_element_type=jnp.float32)
            acc_b1 += jnp.sum(g_h, axis=0, keepdims=True)
        g_v = lax.dot_general(
            g_hb, w1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (G*TM, w)
        g_v = g_v * scale_row
        if relative:
            for gi in range(G):
                gdp_sum = gdp_sum + g_v[gi * tm:(gi + 1) * tm, :3]
        # pad slots (k >= count) gathered v[first]; their one-hots are zero
        # and they never carry gradient (mask loses the first-occurrence
        # tie to the original slot) EXCEPT the empty-ball rows, where slot
        # 0 wins with a zero one-hot — route those rows via oh_first
        g_vb = g_v.astype(jnp.bfloat16)
        acc += lax.dot_general(ohb, g_vb, dn0,
                               preferred_element_type=jnp.float32)
        if k0 == 0:
            empty = (count == 0).astype(jnp.float32)  # (TM,1)
            gv0 = (g_v[0:tm] * empty).astype(jnp.bfloat16)
            acc += lax.dot_general(ohfb, gv0, dn0,
                                   preferred_element_type=jnp.float32)

    # center-row contributions: d(new_xyz) (+ -sum_k g_dp if relative)
    # and d(fi)
    gq_xyz = gnew_ref[0].astype(jnp.float32)
    if relative:
        gq_xyz = gq_xyz - gdp_sum
    gq = jnp.concatenate([gq_xyz, gfi_ref[0].astype(jnp.float32)], axis=1)
    acc += _oh_matmul(oh_q.T, *_split3(gq))
    gfx_ref[0] = gfx_ref[0] + acc
    if wgrads:
        gw1_ref[:] = gw1_ref[:] + acc_w1
        gb1_ref[:] = gb1_ref[:] + acc_b1
        gw2_ref[:] = gw2_ref[:] + acc_w2
        gb2_ref[:] = gb2_ref[:] + acc_b2


def _sa_train_call(radius, nsample, xyz, query_idx, feats, w1, b1, w2, b2,
                   relative, normalize_dp, splits):
    B, N, _ = xyz.shape
    M = query_idx.shape[1]
    C = feats.shape[-1]
    mid = w1.shape[1]
    cout = w2.shape[1]
    vcat, xyz_p, xyzt, n_pad, sx, tm, g_batch = _sa_prep(
        xyz, query_idx, feats, w1, w2, splits, nsample)
    kernel = functools.partial(
        _sa_eval_kernel, radius=float(radius), nsample=nsample, n_real=N,
        c=C, relative=relative, normalize_dp=normalize_dp, splits=splits,
        g_batch=g_batch, sx=sx)
    new_xyz, fi, out = pl.pallas_call(
        kernel,
        grid=(B, M // tm),
        in_specs=[
            pl.BlockSpec((1, tm, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, vcat.shape[-1]), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C + 3, mid), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mid, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, cout), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, M, C), jnp.float32),
            jax.ShapeDtypeStruct((B, M, cout), jnp.float32),
        ),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(query_idx.astype(jnp.int32)[:, :, None], vcat, xyzt, xyz_p,
      w1.astype(jnp.bfloat16), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(jnp.bfloat16), b2.reshape(1, -1).astype(jnp.float32))
    return new_xyz, fi, out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 9, 10, 11, 12))
def _sa_train_vjp(radius, nsample, xyz, query_idx, feats,
                  w1, b1, w2, b2, relative, normalize_dp, splits,
                  param_grads):
    return _sa_train_call(radius, nsample, xyz, query_idx, feats,
                          w1, b1, w2, b2, relative, normalize_dp, splits)


def sa_train_pallas(radius: float, nsample: int, xyz, query_idx, feats,
                    w1, b1, w2, b2, relative: bool = True,
                    normalize_dp: bool = False, splits: int = 1,
                    param_grads: bool = True):
    """Differentiable fused SA stage (see the section comment above).

    Same forward as sa_eval_pallas; the custom VJP backward recomputes the
    grouped activations in VMEM and emits gradients for xyz, feats and the
    folded w1/b1/w2/b2. Max-pool cotangents route to the FIRST maximal
    slot per channel (torch.max argmax class). Inputs may be bf16 under
    the compute policy (cotangents are returned in the primal dtypes).

    ``param_grads=False`` statically drops the w1/b1/w2/b2 cotangent
    computation from the backward kernel (their grads return as zeros) —
    for callers that KNOW the weights are frozen (the GAN fake pass;
    custom_vjp otherwise computes cotangents JAX cannot DCE)."""
    return _sa_train_vjp(radius, nsample, xyz, query_idx, feats,
                         w1, b1, w2, b2, bool(relative),
                         bool(normalize_dp), int(splits),
                         bool(param_grads))


def _sa_train_fwd(radius, nsample, xyz, query_idx, feats, w1, b1, w2, b2,
                  relative, normalize_dp, splits, param_grads):
    new_xyz, fi, out = _sa_train_call(radius, nsample, xyz, query_idx,
                                      feats, w1, b1, w2, b2, relative,
                                      normalize_dp, splits)
    res = (xyz, query_idx, feats, w1, b1, w2, b2, out)
    return (new_xyz, fi, out), res


def _sa_train_bwd(radius, nsample, relative, normalize_dp, splits,
                  param_grads, res, grads):
    xyz, query_idx, feats, w1, b1, w2, b2, out = res
    g_new, g_fi, g_out = grads
    B, N, _ = xyz.shape
    M = query_idx.shape[1]
    C = feats.shape[-1]
    mid = w1.shape[1]
    cout = w2.shape[1]
    vcat, xyz_p, xyzt, n_pad, sx, tm, g_batch = _sa_prep(
        xyz, query_idx, feats, w1, w2, splits, nsample)
    kernel = functools.partial(
        _sa_bwd_kernel, radius=float(radius), nsample=nsample, n_real=N,
        c=C, relative=relative, normalize_dp=normalize_dp, splits=splits,
        g_batch=g_batch, sx=sx, wgrads=param_grads)
    w_out_specs = (
        pl.BlockSpec((C + 3, mid), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, mid), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mid, cout), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ) if param_grads else ()
    w_out_shapes = (
        jax.ShapeDtypeStruct((C + 3, mid), jnp.float32),
        jax.ShapeDtypeStruct((1, mid), jnp.float32),
        jax.ShapeDtypeStruct((mid, cout), jnp.float32),
        jax.ShapeDtypeStruct((1, cout), jnp.float32),
    ) if param_grads else ()
    outs = pl.pallas_call(
        kernel,
        grid=(B, M // tm),
        in_specs=[
            pl.BlockSpec((1, tm, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, vcat.shape[-1]), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C + 3, mid), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mid, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, cout), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, cout), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_pad, C + 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ) + w_out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((B, n_pad, C + 3), jnp.float32),
        ) + w_out_shapes,
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(query_idx.astype(jnp.int32)[:, :, None], vcat, xyzt, xyz_p,
      w1.astype(jnp.bfloat16), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(jnp.bfloat16), b2.reshape(1, -1).astype(jnp.float32),
      out, g_out, g_fi, g_new)
    if param_grads:
        gfx, gw1, gb1, gw2, gb2 = outs
        gw = (gw1.astype(w1.dtype), gb1.reshape(b1.shape).astype(b1.dtype),
              gw2.astype(w2.dtype), gb2.reshape(b2.shape).astype(b2.dtype))
    else:
        (gfx,) = outs
        gw = (jnp.zeros_like(w1), jnp.zeros_like(b1),
              jnp.zeros_like(w2), jnp.zeros_like(b2))
    return (gfx[:, :N, :3].astype(xyz.dtype), None,
            gfx[:, :N, 3:].astype(feats.dtype)) + gw


_sa_train_vjp.defvjp(_sa_train_fwd, _sa_train_bwd)
