"""Fused TRAIN-mode SetAbstraction stage: ball-group + conv + batch-stats
BatchNorm + relu + conv + BatchNorm + max-pool with a custom VJP — the
grouped (B,K,M,3+C) tensor and every intermediate activation stay in VMEM
in BOTH directions.

This is the VERDICT-r3 #2 lever ("fused train-BN SA needs a two-pass
cross-tile reduction design"): eval-mode BN is a per-channel affine the
eval kernel folds into the conv weights (ops/pallas/saeval.py), but
TRAIN-mode BN normalizes with statistics of the CURRENT batch computed
over all (B, M, K) slots — a cross-tile reduction that cannot be folded
ahead of time. The reference runs this stage as four separate CUDA kernels
with HBM round-trips (ball_query + group_points, then torch Conv2d/
BatchNorm2d/ReLU chains over the grouped tensor:
openpoints/models/backbone/pointnext.py:81-170).

Design (2 forward + 2 backward grid passes, each recomputing the selection
and gathers in VMEM — the established recompute-not-save pattern of
_sa_bwd_kernel):

  F1  gather rows v=[dp||fj]; accumulate Sv = sum(v) and Svv = sum(v v^T)
      across the whole grid. BN1 statistics follow OUTSIDE the kernel from
      the sandwich  E[y1] = (Sv W1)/n,  E[y1^2] = diag(W1^T Svv W1)/n
      (y1 = v W1 is linear, so its first/second moments are exact
      functions of v's moments — conv1 never runs in this pass).
  F2  recompute gather; y1 = v W1; y1' = A1*(y1-mu1)+beta1 (BN1 affine
      with BATCH stats); h = relu(y1'); y2 = h W2; accumulate sum(y2),
      sum(y2^2) for BN2 stats; emit per-(m,c) max AND min of y2 over the
      K slots. OUTSIDE: BN2 is per-channel monotone (slope a2 =
      gamma2/sqrt(var2+eps)), so max_k BN2(y2) = a2*max_k(y2)+c2 where
      a2>0 and a2*min_k(y2)+c2 where a2<0 — the pooled output needs only
      (ymax, ymin), never the slot tensor.
  B1  recompute through y2; route the pooled cotangent to the FIRST slot
      matching the saved selected value (recompute is bit-identical: same
      tile config, same op order); BN2 backward in the dense affine form
      dL/dy2 = A2*g_sparse + P2 + Q2*y2 (P2/Q2 are per-channel constants
      from pooled-level sums — see _bn_dense_coeffs); accumulate dW2 and
      the BN1 backward's cross-tile sums sum(g_y1'), sum(g_y1' * xhat1).
  B2  recompute again; dL/dy1 = A1*g_y1' + P1 + Q1*y1 (same dense form);
      dW1 += v^T dL/dy1; dL/dv = (dL/dy1) W1^T scattered through
      transposed one-hot matmuls — pad slots (k >= count) and empty balls
      route through the gathered-first one-hot, exactly where the unfused
      grouping's gather VJP sends them.

Gradient identities used (all exact, not approximations):
  * BatchNorm backward: with xhat=(x-mu)/sigma and upstream g,
    dL/dx_i = (gamma/sigma) * (g_i - mean(g) - xhat_i * mean(g*xhat)).
    The mean(g)/mean(g*xhat) terms make the cotangent DENSE over all
    slots even though the max-pool upstream is sparse — but it is affine
    in x, so it carries as two per-channel constants (P, Q).
  * BN2's cross-slot sums need only POOLED tensors: the sparse upstream g
    is zero except at selected slots, whose xhat2 equals the pooled
    (ystar-mu2)/sigma2 — so sum(g) and sum(g*xhat2) are (B,M)-level
    reductions computed outside any kernel.
  * Max-pool ties (pad slots duplicate their ball's first row, so ties
    are common): first-match routing is EXACTLY equal in total to the
    unfused jnp.max tie-splitting because tied slots are duplicated rows
    that scatter to the same source point with the same v/h (the class
    ops/pallas/saeval.py already documents).

Numerics: gathers are exact 3-way bf16 splits, scatters exact 3-way split
cotangents, all conv matmuls run f32 on the MXU — this path is the same
numerics class as the unfused XLA f32 train step (parity ~1e-5), NOT the
bf16 activation-grade class of the eval/GAN kernels, so adopting it needs
no training-trajectory revalidation.

Reference for semantics being fused: openpoints/models/backbone/
pointnext.py:81-170 (SetAbstraction), openpoints/cpp/pointnet2_batch/src/
ball_query_gpu.cu:16-51 (first-K-in-radius, pad-with-first, empty->lane 0).

Measured verdict (v5e-1, scripts/check_trainbn_phaseb.py, phase-B bench
protocol B=32): 22.2 ms/step fused vs 20.3 ms unfused — the 4 grid
passes re-running selection+gathers cost more than the HBM round-trips
they remove at these shapes, so the path stays OPT-IN
(ADAPTPOINT_TPU_TRAIN_FUSED=1) and the default phase B keeps the unfused
chain. The kernel family is correctness-complete (CPU-interpreter f32
parity tests + TPU golden at PointNeXt-S shapes) for shapes where the
balance tips the other way (larger B / wider channels).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ballgroup import (_COMPILER_PARAMS, _inball_rank, _oh_matmul, _round_up,
                        _search_tiles, _split3)

__all__ = ["sa_trainbn_pallas"]


def _interpret() -> bool:
    import os
    return os.environ.get("ADAPTPOINT_TPU_PALLAS_INTERPRET", "0") == "1"


def _pick_tm_g(m, n_pad, w_pad, mid_pad, cout_pad, fixed_bytes, nsample):
    """(tile, g_batch) under the VMEM budget for the train-BN kernels.

    Modeled on saeval._pick_tm_g but with this family's fatter per-tile
    working set: the backward passes hold up to ~6 (G*TM, mid/cout) f32
    activation/cotangent buffers live at once plus the 3-way split scatter
    copies. g must divide nsample (the k-loop is range(0, K, G)).
    ``ADAPTPOINT_TPU_TRAINBN_TILE=tm,g`` overrides (clamped to divisors).
    """
    budget = 24 * 1024 * 1024

    def fits(tm, g):
        work = tm * n_pad * 12                      # d2/rank/mask/iota
        sel = g * tm * n_pad * 3                    # bf16 one-hot + compare
        # widest pass (B2): gg + y1/y1'/h + y2/g_y2 + g_h/g_y1'/g_y1 + g_v
        mlp = g * tm * (2 * w_pad + 3 * mid_pad + 2 * cout_pad
                        + 3 * mid_pad + w_pad) * 4
        out_tiles = 2 * tm * (3 * 128 + w_pad + 2 * cout_pad) * 4
        return fixed_bytes + work + sel + mlp + out_tiles <= budget

    return _search_tiles(m, fits, (4, 8, 2, 1), nsample,
                         "ADAPTPOINT_TPU_TRAINBN_TILE")


def _prep(xyz, query_idx, feats, w1, w2, nsample):
    """Pack the exact 3-split value matrix + pick tiles. All four passes
    MUST use the same (vcat, tm, g) so recomputed activations bit-match."""
    B, N, _ = xyz.shape
    M = query_idx.shape[1]
    C = feats.shape[-1]
    mid = w1.shape[1]
    cout = w2.shape[1]
    n_pad = _round_up(N, 128)

    f_hi, f_mid, f_lo = _split3(feats)
    x_hi, x_mid, x_lo = _split3(xyz)
    vcat = jnp.concatenate(
        [jax.lax.optimization_barrier(p)
         for p in (x_hi, x_mid, x_lo, f_hi, f_mid, f_lo)], axis=-1)

    w = C + 3
    w_pad = _round_up(w, 128)
    fixed = (n_pad * _round_up(vcat.shape[-1], 128) * 2      # vcat bf16
             + 8 * n_pad * 4 + n_pad * 128 * 4               # xyzt + xyz
             + w_pad * _round_up(mid, 128) * 4               # w1 f32
             + mid * _round_up(cout, 128) * 4                # w2 f32
             + n_pad * w_pad * 4                             # B2 grad acc
             + w_pad * _round_up(mid, 128) * 4)              # dW1 acc
    tm, g_batch = _pick_tm_g(M, n_pad, w_pad, _round_up(mid, 128),
                             _round_up(cout, 128), fixed, nsample)
    if n_pad != N:
        xyz_p = jnp.pad(xyz, ((0, 0), (0, n_pad - N), (0, 0)))
        vcat = jnp.pad(vcat, ((0, 0), (0, n_pad - N), (0, 0)))
    else:
        xyz_p = xyz
    xyzt = jnp.transpose(xyz_p, (0, 2, 1))
    return vcat, xyz_p, xyzt, n_pad, tm, g_batch


# ---------------------------------------------------------------------------
# shared per-tile skeleton: selection, rank, first-row gather, k-group gather
# ---------------------------------------------------------------------------


def _select(qidx_ref, xyzt_ref, xyz_ref, radius, n_real, tm, n_pad):
    lane = lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)
    x_hi, x_mid, x_lo = _split3(xyz_ref[0])
    oh_q = (lane == qidx_ref[0, :, 0][:, None]).astype(jnp.bfloat16)
    q = _oh_matmul(oh_q, x_hi, x_mid, x_lo)  # (TM, 3) exact f32 centers
    xt = xyzt_ref[0]
    dx = q[:, 0:1] - xt[0:1, :]
    dy = q[:, 1:2] - xt[1:2, :]
    dz = q[:, 2:3] - xt[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz
    inball = (d2 < jnp.float32(radius) ** 2) & (lane < n_real)
    rank, count = _inball_rank(inball, tm, n_pad)
    ranked = jnp.where(inball, rank, 0)
    oh_first_i = (ranked == 1).astype(jnp.int32)
    oh_first_i = jnp.where(count > 0, oh_first_i,
                           (lane == 0).astype(jnp.int32))
    return lane, oh_q, q, ranked, count, oh_first_i.astype(jnp.bfloat16)


def _sum_splits3(r, c, off):
    s = r[:, off:off + c]
    s = s + r[:, off + c:off + 2 * c]
    return s + r[:, off + 2 * c:off + 3 * c]


def _gather_first(ohfb, vcat, c):
    """(TM, w) exact rows of each ball's first neighbor (lane 0 if empty)."""
    rf = jnp.dot(ohfb, vcat, preferred_element_type=jnp.float32)
    return jnp.concatenate(
        [_sum_splits3(rf, 3, 0), _sum_splits3(rf, c, 9)], axis=1)


def _gather_kgroup(ranked, count, vcat, gg_f, k0, G, tm, n_pad, c,
                   q_wide, scale_row, relative):
    """(G*TM, w) rows for slots k0..k0+G-1 with pad-with-first + relative
    dp applied — bit-identical across all four passes."""
    kvals = k0 + 1 + lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0)
    ohb = (ranked[None] == kvals).astype(jnp.bfloat16).reshape(
        G * tm, n_pad)
    r = jnp.dot(ohb, vcat, preferred_element_type=jnp.float32)
    gg = jnp.concatenate(
        [_sum_splits3(r, 3, 0), _sum_splits3(r, c, 9)], axis=1)
    pieces = [jnp.where(count > (k0 + gi), gg[gi * tm:(gi + 1) * tm], gg_f)
              for gi in range(G)]
    gg = jnp.concatenate(pieces, axis=0) if G > 1 else pieces[0]
    if relative:
        gg = (gg - jnp.concatenate([q_wide] * G, axis=0)
              if G > 1 else gg - q_wide) * scale_row
    return ohb, gg


def _dp_consts(q, w, relative, normalize_dp, radius):
    colw = lax.broadcasted_iota(jnp.int32, (1, w), 1)
    dp_scale = jnp.float32(1.0 / radius) if (relative and normalize_dp) \
        else jnp.float32(1.0)
    scale_row = jnp.where(colw < 3, dp_scale, jnp.float32(1.0))
    q_wide = None
    if relative:
        q_wide = (jnp.where(colw == 0, q[:, 0:1], 0.0)
                  + jnp.where(colw == 1, q[:, 1:2], 0.0)
                  + jnp.where(colw == 2, q[:, 2:3], 0.0))
    return q_wide, scale_row


# ---------------------------------------------------------------------------
# F1: first/second moments of the gathered rows (BN1 stats via sandwich)
# ---------------------------------------------------------------------------


def _f1_kernel(qidx_ref, vcat_ref, xyzt_ref, xyz_ref, sv_ref, svv_ref, *,
               radius, nsample, n_real, c, relative, normalize_dp, g_batch):
    n_pad = vcat_ref.shape[1]
    tm = qidx_ref.shape[1]
    K, G = nsample, g_batch
    w = c + 3

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        sv_ref[:] = jnp.zeros_like(sv_ref[:])
        svv_ref[:] = jnp.zeros_like(svv_ref[:])

    lane, oh_q, q, ranked, count, ohfb = _select(
        qidx_ref, xyzt_ref, xyz_ref, radius, n_real, tm, n_pad)
    q_wide, scale_row = _dp_consts(q, w, relative, normalize_dp, radius)
    vcat = vcat_ref[0]
    gg_f = _gather_first(ohfb, vcat, c)

    sv = jnp.zeros((1, w), jnp.float32)
    svv = jnp.zeros((w, w), jnp.float32)
    dn0 = (((0,), (0,)), ((), ()))
    for k0 in range(0, K, G):
        _, gg = _gather_kgroup(ranked, count, vcat, gg_f, k0, G, tm,
                               n_pad, c, q_wide, scale_row, relative)
        sv = sv + jnp.sum(gg, axis=0, keepdims=True)
        svv = svv + lax.dot_general(gg, gg, dn0,
                                    preferred_element_type=jnp.float32)
    sv_ref[:] = sv_ref[:] + sv
    svv_ref[:] = svv_ref[:] + svv


# ---------------------------------------------------------------------------
# F2: forward with BN1 batch affine; emits ymax/ymin + BN2 moment sums
# ---------------------------------------------------------------------------


def _f2_kernel(qidx_ref, vcat_ref, xyzt_ref, xyz_ref, w1_ref, a1_ref,
               nb1_ref, w2_ref, newxyz_ref, fi_ref, ymax_ref, ymin_ref,
               s2_ref, q2_ref, *, radius, nsample, n_real, c, relative,
               normalize_dp, g_batch):
    n_pad = vcat_ref.shape[1]
    tm = qidx_ref.shape[1]
    K, G = nsample, g_batch
    w = c + 3

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        s2_ref[:] = jnp.zeros_like(s2_ref[:])
        q2_ref[:] = jnp.zeros_like(q2_ref[:])

    lane, oh_q, q, ranked, count, ohfb = _select(
        qidx_ref, xyzt_ref, xyz_ref, radius, n_real, tm, n_pad)
    q_wide, scale_row = _dp_consts(q, w, relative, normalize_dp, radius)
    vcat = vcat_ref[0]
    gg_f = _gather_first(ohfb, vcat, c)

    newxyz_ref[0] = q
    rq = jnp.dot(oh_q, vcat, preferred_element_type=jnp.float32)
    fi_ref[0] = _sum_splits3(rq, c, 9)

    w1 = w1_ref[:]
    a1 = a1_ref[:]
    nb1 = nb1_ref[:]
    w2 = w2_ref[:]
    cout = w2.shape[1]

    out_max = jnp.full((tm, cout), -jnp.inf, jnp.float32)
    out_min = jnp.full((tm, cout), jnp.inf, jnp.float32)
    s2 = jnp.zeros((1, cout), jnp.float32)
    q2 = jnp.zeros((1, cout), jnp.float32)
    for k0 in range(0, K, G):
        _, gg = _gather_kgroup(ranked, count, vcat, gg_f, k0, G, tm,
                               n_pad, c, q_wide, scale_row, relative)
        y1 = jnp.dot(gg, w1, preferred_element_type=jnp.float32)
        h = jnp.maximum(y1 * a1 + nb1, 0.0)
        y2 = jnp.dot(h, w2, preferred_element_type=jnp.float32)
        s2 = s2 + jnp.sum(y2, axis=0, keepdims=True)
        q2 = q2 + jnp.sum(y2 * y2, axis=0, keepdims=True)
        for gi in range(G):
            ok = y2[gi * tm:(gi + 1) * tm]
            out_max = jnp.maximum(out_max, ok)
            out_min = jnp.minimum(out_min, ok)
    ymax_ref[0] = out_max
    ymin_ref[0] = out_min
    s2_ref[:] = s2_ref[:] + s2
    q2_ref[:] = q2_ref[:] + q2


# ---------------------------------------------------------------------------
# B1/B2: backward recompute passes (see module docstring)
# ---------------------------------------------------------------------------


def _bwd_kernel(qidx_ref, vcat_ref, xyzt_ref, xyz_ref, w1_ref, a1_ref,
                nb1_ref, w2_ref, mu1_ref, r1_ref, a2_ref, p2_ref, q2c_ref,
                ystar_ref, gout_ref, *args, radius, nsample, n_real, c,
                relative, normalize_dp, g_batch, phase2: bool):
    if phase2:
        (p1_ref, q1c_ref, gfi_ref, gnew_ref,
         gfx_ref, dw1_ref) = args
    else:
        (dw2_ref, sg1_ref, sgx1_ref) = args
    n_pad = vcat_ref.shape[1]
    tm = qidx_ref.shape[1]
    K, G = nsample, g_batch
    w = c + 3

    if phase2:
        @pl.when(pl.program_id(1) == 0)
        def _init_fx():
            gfx_ref[0] = jnp.zeros_like(gfx_ref[0])

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init_w1():
            dw1_ref[:] = jnp.zeros_like(dw1_ref[:])
    else:
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init_acc():
            dw2_ref[:] = jnp.zeros_like(dw2_ref[:])
            sg1_ref[:] = jnp.zeros_like(sg1_ref[:])
            sgx1_ref[:] = jnp.zeros_like(sgx1_ref[:])

    lane, oh_q, q, ranked, count, ohfb = _select(
        qidx_ref, xyzt_ref, xyz_ref, radius, n_real, tm, n_pad)
    q_wide, scale_row = _dp_consts(q, w, relative, normalize_dp, radius)
    vcat = vcat_ref[0]
    gg_f = _gather_first(ohfb, vcat, c)

    w1 = w1_ref[:]
    a1 = a1_ref[:]
    nb1 = nb1_ref[:]
    w2 = w2_ref[:]
    mu1 = mu1_ref[:]
    r1 = r1_ref[:]
    a2 = a2_ref[:]
    p2 = p2_ref[:]
    q2c = q2c_ref[:]
    cout = w2.shape[1]
    mid = w1.shape[1]
    ystar = ystar_ref[0]
    g_out = gout_ref[0]
    if phase2:
        p1 = p1_ref[:]
        q1c = q1c_ref[:]
        acc = jnp.zeros((n_pad, w), jnp.float32)
        acc_w1 = jnp.zeros((w, mid), jnp.float32)
        gdp_sum = jnp.zeros((tm, 3), jnp.float32)
    else:
        acc_w2 = jnp.zeros((mid, cout), jnp.float32)
        sg1 = jnp.zeros((1, mid), jnp.float32)
        sgx1 = jnp.zeros((1, mid), jnp.float32)

    matched = jnp.zeros((tm, cout), jnp.float32)
    dn0 = (((0,), (0,)), ((), ()))
    dnT = (((1,), (1,)), ((), ()))
    for k0 in range(0, K, G):
        ohb, gg = _gather_kgroup(ranked, count, vcat, gg_f, k0, G, tm,
                                 n_pad, c, q_wide, scale_row, relative)
        # === bit-exact replay of F2's per-slot compute ===
        y1 = jnp.dot(gg, w1, preferred_element_type=jnp.float32)
        y1p = y1 * a1 + nb1
        h = jnp.maximum(y1p, 0.0)
        y2 = jnp.dot(h, w2, preferred_element_type=jnp.float32)
        # first slot matching the selected (max-or-min per sign) value
        masks = []
        for gi in range(G):
            ok = y2[gi * tm:(gi + 1) * tm]
            mk = jnp.where((ok == ystar) & (matched == 0.0),
                           jnp.float32(1.0), jnp.float32(0.0))
            matched = matched + mk
            masks.append(mk)
        mask = jnp.concatenate(masks, axis=0) if G > 1 else masks[0]
        gob = jnp.concatenate([g_out] * G, axis=0) if G > 1 else g_out
        g_y2 = a2 * (mask * gob) + p2 + q2c * y2          # dense BN2 bwd
        g_h = lax.dot_general(g_y2, w2, dnT,
                              preferred_element_type=jnp.float32)
        g_y1p = jnp.where(y1p > 0.0, g_h, 0.0)
        if not phase2:
            acc_w2 += lax.dot_general(h, g_y2, dn0,
                                      preferred_element_type=jnp.float32)
            sg1 += jnp.sum(g_y1p, axis=0, keepdims=True)
            xhat1 = (y1 - mu1) * r1
            sgx1 += jnp.sum(g_y1p * xhat1, axis=0, keepdims=True)
            continue
        g_y1 = a1 * g_y1p + p1 + q1c * y1                 # dense BN1 bwd
        acc_w1 += lax.dot_general(gg, g_y1, dn0,
                                  preferred_element_type=jnp.float32)
        g_v = lax.dot_general(g_y1, w1, dnT,
                              preferred_element_type=jnp.float32)
        g_v = g_v * scale_row
        if relative:
            for gi in range(G):
                gdp_sum = gdp_sum + g_v[gi * tm:(gi + 1) * tm, :3]
        # scatter: real slots through their one-hots (pad rows' one-hots
        # are zero), pad/empty slots through the gathered-first one-hot —
        # the unfused grouping's gather VJP sends them to the same source
        v_hi, v_mid, v_lo = _split3(g_v)
        acc += lax.dot_general(ohb, v_hi, dn0,
                               preferred_element_type=jnp.float32)
        acc += lax.dot_general(ohb, v_mid, dn0,
                               preferred_element_type=jnp.float32)
        acc += lax.dot_general(ohb, v_lo, dn0,
                               preferred_element_type=jnp.float32)
        pad = jnp.zeros((tm, w), jnp.float32)
        for gi in range(G):
            pad = pad + jnp.where(count <= (k0 + gi),
                                  g_v[gi * tm:(gi + 1) * tm], 0.0)
        p_hi, p_mid, p_lo = _split3(pad)
        acc += lax.dot_general(ohfb, p_hi, dn0,
                               preferred_element_type=jnp.float32)
        acc += lax.dot_general(ohfb, p_mid, dn0,
                               preferred_element_type=jnp.float32)
        acc += lax.dot_general(ohfb, p_lo, dn0,
                               preferred_element_type=jnp.float32)

    if phase2:
        gq_xyz = gnew_ref[0].astype(jnp.float32)
        if relative:
            gq_xyz = gq_xyz - gdp_sum
        gq = jnp.concatenate([gq_xyz, gfi_ref[0].astype(jnp.float32)],
                             axis=1)
        acc += _oh_matmul(oh_q.T, *_split3(gq))
        gfx_ref[0] = gfx_ref[0] + acc
        dw1_ref[:] = dw1_ref[:] + acc_w1
    else:
        dw2_ref[:] = dw2_ref[:] + acc_w2
        sg1_ref[:] = sg1_ref[:] + sg1
        sgx1_ref[:] = sgx1_ref[:] + sgx1


# ---------------------------------------------------------------------------
# host-side orchestration + custom VJP
# ---------------------------------------------------------------------------


def _common_specs(n_pad, tm, cols):
    return [
        pl.BlockSpec((1, tm, 1), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, cols), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, n_pad), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, 3), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _acc_spec(rows, cols):
    return pl.BlockSpec((rows, cols), lambda b, t: (0, 0),
                        memory_space=pltpu.VMEM)


def _row(x):
    return x.reshape(1, -1).astype(jnp.float32)


def _sa_trainbn_primal(radius, nsample, xyz, query_idx, feats,
                       w1, gamma1, beta1, w2, gamma2, beta2,
                       relative, normalize_dp, eps):
    B, N, _ = xyz.shape
    M = query_idx.shape[1]
    C = feats.shape[-1]
    w = C + 3
    mid = w1.shape[1]
    cout = w2.shape[1]
    K = nsample
    n = B * M * K
    vcat, xyz_p, xyzt, n_pad, tm, g_batch = _prep(
        xyz, query_idx, feats, w1, w2, nsample)
    qidx = query_idx.astype(jnp.int32)[:, :, None]
    kw = dict(radius=float(radius), nsample=K, n_real=N, c=C,
              relative=relative, normalize_dp=normalize_dp, g_batch=g_batch)

    sv, svv = pl.pallas_call(
        functools.partial(_f1_kernel, **kw),
        grid=(B, M // tm),
        in_specs=_common_specs(n_pad, tm, vcat.shape[-1]),
        out_specs=(_acc_spec(1, w), _acc_spec(w, w)),
        out_shape=(jax.ShapeDtypeStruct((1, w), jnp.float32),
                   jax.ShapeDtypeStruct((w, w), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(qidx, vcat, xyzt, xyz_p)

    w1f = w1.astype(jnp.float32)
    mu1 = (sv @ w1f)[0] / n                                   # (mid,)
    ey1sq = jnp.einsum("wm,wv,vm->m", w1f, svv, w1f) / n
    var1 = ey1sq - mu1 * mu1
    r1 = lax.rsqrt(var1 + eps)
    a1 = gamma1.astype(jnp.float32) * r1
    nb1 = beta1.astype(jnp.float32) - mu1 * a1

    new_xyz, fi, ymax, ymin, s2, q2 = pl.pallas_call(
        functools.partial(_f2_kernel, **kw),
        grid=(B, M // tm),
        in_specs=_common_specs(n_pad, tm, vcat.shape[-1]) + [
            _acc_spec(w, mid), _acc_spec(1, mid), _acc_spec(1, mid),
            _acc_spec(mid, cout)],
        out_specs=(
            pl.BlockSpec((1, tm, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, cout), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, cout), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            _acc_spec(1, cout), _acc_spec(1, cout)),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, M, C), jnp.float32),
            jax.ShapeDtypeStruct((B, M, cout), jnp.float32),
            jax.ShapeDtypeStruct((B, M, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(qidx, vcat, xyzt, xyz_p, w1f, _row(a1), _row(nb1),
      w2.astype(jnp.float32))

    mu2 = s2[0] / n
    var2 = q2[0] / n - mu2 * mu2
    r2 = lax.rsqrt(var2 + eps)
    a2 = gamma2.astype(jnp.float32) * r2
    c2 = beta2.astype(jnp.float32) - mu2 * a2
    ystar = jnp.where(a2 > 0, ymax, ymin)
    out = a2 * ystar + c2
    return (new_xyz, fi, out, mu1, var1, mu2, var2), ystar


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 11, 12, 13))
def _sa_trainbn_vjp(radius, nsample, xyz, query_idx, feats,
                    w1, gamma1, beta1, w2, gamma2, beta2,
                    relative, normalize_dp, eps):
    outs, _ = _sa_trainbn_primal(radius, nsample, xyz, query_idx, feats,
                                 w1, gamma1, beta1, w2, gamma2, beta2,
                                 relative, normalize_dp, eps)
    return outs


def _sa_trainbn_fwd(radius, nsample, xyz, query_idx, feats,
                    w1, gamma1, beta1, w2, gamma2, beta2,
                    relative, normalize_dp, eps):
    outs, ystar = _sa_trainbn_primal(radius, nsample, xyz, query_idx, feats,
                                     w1, gamma1, beta1, w2, gamma2, beta2,
                                     relative, normalize_dp, eps)
    _, _, _, mu1, var1, mu2, var2 = outs
    res = (xyz, query_idx, feats, w1, gamma1, beta1, w2, gamma2, beta2,
           mu1, var1, mu2, var2, ystar)
    return outs, res


def _sa_trainbn_bwd(radius, nsample, relative, normalize_dp, eps, res,
                    grads):
    (xyz, query_idx, feats, w1, gamma1, beta1, w2, gamma2, beta2,
     mu1, var1, mu2, var2, ystar) = res
    # cotangents for (mu1, var1, mu2, var2) are the running-stat updates'
    # — never differentiated by the train step (flax mutable collection)
    g_new, g_fi, g_out = [g.astype(jnp.float32) for g in grads[:3]]
    B, N, _ = xyz.shape
    M = query_idx.shape[1]
    C = feats.shape[-1]
    w = C + 3
    mid = w1.shape[1]
    cout = w2.shape[1]
    K = nsample
    n = B * M * K
    vcat, xyz_p, xyzt, n_pad, tm, g_batch = _prep(
        xyz, query_idx, feats, w1, w2, nsample)
    qidx = query_idx.astype(jnp.int32)[:, :, None]
    kw = dict(radius=float(radius), nsample=K, n_real=N, c=C,
              relative=relative, normalize_dp=normalize_dp, g_batch=g_batch)

    r1 = lax.rsqrt(var1 + eps)
    a1 = gamma1.astype(jnp.float32) * r1
    nb1 = beta1.astype(jnp.float32) - mu1 * a1
    r2 = lax.rsqrt(var2 + eps)
    a2 = gamma2.astype(jnp.float32) * r2

    # BN2 backward sums need only POOLED tensors (sparse upstream):
    xhat2s = (ystar - mu2) * r2
    s0_2 = jnp.sum(g_out, axis=(0, 1)) / n
    s1_2 = jnp.sum(g_out * xhat2s, axis=(0, 1)) / n
    d_gamma2 = jnp.sum(g_out * xhat2s, axis=(0, 1))
    d_beta2 = jnp.sum(g_out, axis=(0, 1))
    p2 = -a2 * s0_2 + a2 * s1_2 * mu2 * r2
    q2c = -a2 * s1_2 * r2

    w1f = w1.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    common_in = _common_specs(n_pad, tm, vcat.shape[-1]) + [
        _acc_spec(w, mid), _acc_spec(1, mid), _acc_spec(1, mid),
        _acc_spec(mid, cout), _acc_spec(1, mid), _acc_spec(1, mid),
        _acc_spec(1, cout), _acc_spec(1, cout), _acc_spec(1, cout),
        pl.BlockSpec((1, tm, cout), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm, cout), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    common_args = (qidx, vcat, xyzt, xyz_p, w1f, _row(a1), _row(nb1), w2f,
                   _row(mu1), _row(r1), _row(a2), _row(p2), _row(q2c),
                   ystar, g_out)

    dw2, sg1, sgx1 = pl.pallas_call(
        functools.partial(_bwd_kernel, phase2=False, **kw),
        grid=(B, M // tm),
        in_specs=common_in,
        out_specs=(_acc_spec(mid, cout), _acc_spec(1, mid),
                   _acc_spec(1, mid)),
        out_shape=(jax.ShapeDtypeStruct((mid, cout), jnp.float32),
                   jax.ShapeDtypeStruct((1, mid), jnp.float32),
                   jax.ShapeDtypeStruct((1, mid), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*common_args)

    d_gamma1 = sgx1[0]
    d_beta1 = sg1[0]
    s0_1 = sg1[0] / n
    s1_1 = sgx1[0] / n
    p1 = -a1 * s0_1 + a1 * s1_1 * mu1 * r1
    q1c = -a1 * s1_1 * r1

    gfx, dw1 = pl.pallas_call(
        functools.partial(_bwd_kernel, phase2=True, **kw),
        grid=(B, M // tm),
        in_specs=common_in + [
            _acc_spec(1, mid), _acc_spec(1, mid),
            pl.BlockSpec((1, tm, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_pad, w), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _acc_spec(w, mid)),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_pad, w), jnp.float32),
            jax.ShapeDtypeStruct((w, mid), jnp.float32)),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*common_args, _row(p1), _row(q1c), g_fi, g_new)

    return (gfx[:, :N, :3].astype(xyz.dtype), None,
            gfx[:, :N, 3:].astype(feats.dtype),
            dw1.astype(w1.dtype), d_gamma1.astype(gamma1.dtype),
            d_beta1.astype(beta1.dtype), dw2.astype(w2.dtype),
            d_gamma2.astype(gamma2.dtype), d_beta2.astype(beta2.dtype))


_sa_trainbn_vjp.defvjp(_sa_trainbn_fwd, _sa_trainbn_bwd)


def sa_trainbn_pallas(radius: float, nsample: int, xyz, query_idx, feats,
                      w1, gamma1, beta1, w2, gamma2, beta2,
                      relative: bool = True, normalize_dp: bool = False,
                      eps: float = 1e-5):
    """Fused TRAIN-mode SA stage (see module docstring).

    xyz (B,N,3) f32; query_idx (B,M) i32; feats (B,N,C) f32;
    w1 (3+C, mid); gamma1/beta1 (mid,) BN1 scale/bias;
    w2 (mid, cout); gamma2/beta2 (cout,) BN2 scale/bias.

    Returns (new_xyz (B,M,3), fi (B,M,C), out (B,M,cout),
             mu1, var1, mu2, var2) where out = max_k over the ball of
    BN2(relu(BN1(conv1([dp||fj]))) @ w2) using the CURRENT batch's
    statistics (mu/var returned for the caller's running-average update,
    flax formula var = E[x^2] - E[x]^2). Differentiable w.r.t. xyz, feats
    and all six parameters, including the gradient paths through the
    batch statistics.
    """
    return _sa_trainbn_vjp(float(radius), int(nsample), xyz, query_idx,
                           feats, w1, gamma1, beta1, w2, gamma2, beta2,
                           bool(relative), bool(normalize_dp), float(eps))
