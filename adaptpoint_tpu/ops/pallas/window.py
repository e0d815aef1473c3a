"""Spatially-windowed ball-group kernels (round-4 sub-linear selection).

The full-N kernels in ballgroup.py/saeval.py pay a VPU one-hot-build cost
of ~K*M*N compare+convert lane-ops per stage — the measured structural
floor of phase A (STATUS.md round-3 breakdown). This module removes the N
factor: each center tile scans only a contiguous WINDOW of points sorted
along the cloud's widest axis, provably covering every ball in the tile.

Exactness (the TPU goldens stay bit-exact vs the reference ball query,
cpp/pointnet2_batch/src/ball_query_gpu.cu:16-51 first-K-in-INDEX-order +
pad-with-first + empty-ball->point[0]):

- The window is a SUPERSET of each ball by construction: points sorted by
  key = xyz[.., axis]; for a tile of centers with keys in [a, b], every
  in-ball point has key in (a - r, b + r); the window is the searchsorted
  span of [a - r - eps, b + r + eps], floor-128-aligned. Extra candidates
  are harmless — they simply fail the d2 < r^2 test.
- d2 stays in the reference's direct form (dx*dx + dy*dy + dz*dz on exact
  f32 coordinates), so the strict radius boundary is bit-identical.
- The first-K-in-INDEX-order rank survives the sort: candidates carry
  their ORIGINAL index, and the in-ball rank is computed as ONE bf16
  matmul  rank = inball @ C,  C[i, j] = [idx_i <= idx_j]  (0/1 products,
  f32 accumulation — exact to 2^24). This keeps the rank on the MXU; only
  the (K-slot one-hot) build stays on the VPU, now over W << N lanes.
- Centers are processed in key-sorted order (tiles must be spatially
  coherent for small windows) and every output is un-permuted back to
  query order; the backward re-permutes cotangents and un-sorts the
  accumulated input gradient. Both permutations ride the exact Pallas
  row-gather (ops/pallas/gather.py), not the slow XLA gather.
- If ANY tile's required span exceeds the static window width W (possible
  for adversarial key distributions), `window_ok` reports False and the
  caller falls back to the full-N kernel via lax.cond — exact either way.

Only pooled-output consumers are windowed (ball_group_maxpool — the
augmentor's PointsetGrouper — and the fused SA stages): their outputs are
(B, M, C)-sized, so the un-permute is one cheap row-gather. The plain
dpfj-producing kernel keeps the full-N path (un-permuting (B, K, M, C)
would re-create the HBM traffic the fusion removed).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ballgroup import (_COMPILER_PARAMS, _round_up, _split3, _oh_matmul)
from .gather import gather_rows_pallas

__all__ = ["window_prep", "ball_group_maxpool_windowed"]


def _interpret() -> bool:
    """CPU-interpreter testing hook (same convention as saeval/attention)."""
    import os
    return os.environ.get("ADAPTPOINT_TPU_PALLAS_INTERPRET", "0") == "1"


def _gather_rows(points, idx):
    """Exact row gather: Pallas one-hot matmuls on TPU, XLA take_along_axis
    under the CPU interpreter (gather.py has no interpret path)."""
    if _interpret():
        return jnp.take_along_axis(points, idx[:, :, None].astype(jnp.int32),
                                   axis=1)
    return gather_rows_pallas(points, idx)


def pick_window(n_pad: int, radius: float, m: int, tm: int,
                extent: float = 2.0) -> int:
    """Static window width: expected tile span + ball diameter, padded.

    Models a roughly uniform key distribution over ``extent`` (normalized
    clouds span ~[-1, 1]): a tile of tm of m centers spans ~extent*tm/m in
    key units, the ball adds 2r, and density ~ n/extent points per unit.
    The +25% margin and 128-alignment absorb non-uniformity; true overflow
    is caught exactly by window_ok at runtime. ``ADAPTPOINT_TPU_WINDOW``
    overrides for experiments."""
    import os
    ov = os.environ.get("ADAPTPOINT_TPU_WINDOW")
    if ov:
        return min(n_pad, _round_up(int(ov), 128))
    frac = (extent * tm / m + 2.0 * radius) / extent
    w = int(n_pad * frac * 1.25)
    return min(n_pad, _round_up(max(w, 256), 128))


def window_prep(xyz, query_idx, radius: float, tm: int, w: int,
                stats_only: bool = False):
    """XLA-side sort/permutation/window computation.

    ``stats_only=True`` skips the sorted-coordinate materialization and
    returns only the cheap fields (ok/win/perms) — used by the dispatch
    wrapper to decide the lax.cond branch without paying the row gather.

    xyz (B, N, 3) f32, query_idx (B, M) i32 -> dict with:
      order (B, N) i32        sorted-pos -> original index
      inv (B, N) i32          original index -> sorted pos
      xyz_s (B, N, 3) f32     coordinate-sorted points (exact gather)
      cperm (B, M) i32        key-sorted center order (query-space perm)
      cinv (B, M) i32         inverse center perm (for un-permuting outputs)
      qpos (B, M) i32         sorted-array position of each (sorted) center
      win (B, T) i32          per-tile 128-aligned window starts
      ok () bool              every tile's required span fits in w
    """
    B, N, _ = xyz.shape
    M = query_idx.shape[1]
    T = M // tm
    n_pad = _round_up(N, 128)

    ext = jnp.max(xyz, axis=1) - jnp.min(xyz, axis=1)        # (B, 3)
    axis = jnp.argmax(ext, axis=1)                            # (B,)
    keys = jnp.take_along_axis(xyz, axis[:, None, None], 2)[..., 0]  # (B, N)

    order = jnp.argsort(keys, axis=1).astype(jnp.int32)       # (B, N)
    keys_s = jnp.take_along_axis(keys, order, axis=1)
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    inv = jnp.zeros((B, N), jnp.int32).at[
        jnp.arange(B)[:, None], order].set(iota)

    ck = jnp.take_along_axis(keys, query_idx.astype(jnp.int32), 1)  # (B, M)
    cperm = jnp.argsort(ck, axis=1).astype(jnp.int32)
    cinv = jnp.zeros((B, M), jnp.int32).at[
        jnp.arange(B)[:, None], cperm].set(
        jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M)))
    q_sorted = jnp.take_along_axis(query_idx.astype(jnp.int32), cperm, 1)
    qpos = jnp.take_along_axis(inv, q_sorted, 1)              # (B, M)

    ck_s = jnp.take_along_axis(ck, cperm, 1).reshape(B, T, tm)
    eps = jnp.float32(radius) * 1e-5 + 1e-7
    lo_key = ck_s[:, :, 0] - (radius + eps)                   # (B, T)
    hi_key = ck_s[:, :, -1] + (radius + eps)
    lo = jax.vmap(lambda k, q: jnp.searchsorted(k, q, side="left"))(
        keys_s, lo_key).astype(jnp.int32)
    hi = jax.vmap(lambda k, q: jnp.searchsorted(k, q, side="right"))(
        keys_s, hi_key).astype(jnp.int32)
    # starts stored in units of 128 lanes: the kernel multiplies back, so
    # Mosaic can statically prove the dynamic-slice alignment
    win = jnp.clip(lo // 128, 0, max(n_pad - w, 0) // 128)
    ok = jnp.all(hi - win * 128 <= w)

    xyz_s = None if stats_only else _gather_rows(xyz, order)  # exact f32
    return dict(order=order, inv=inv, xyz_s=xyz_s, cperm=cperm, cinv=cinv,
                qpos=qpos, win=win, ok=ok)


def _pick_g(k: int, tm: int, w: int, c_pad: int) -> int:
    budget = 24 * 1024 * 1024
    for g in (8, 4, 2, 1):
        if k % g != 0:
            continue
        sel = g * tm * w * 3          # bf16 stacked one-hot + compare temp
        gat = g * tm * c_pad * 8
        if sel + gat <= budget // 3:  # leave room for the resident arrays
            return g
    return 1


# ---------------------------------------------------------------------------
# Windowed ball-group + max/min pool (the augmentor grouper).
# Mirrors ballgroup._fwd_max_kernel/_bwd_max_kernel with the window/C-rank
# machinery; see that file for the slot/gradient semantics.
# ---------------------------------------------------------------------------


def _wfwd_max_kernel(ws_ref, qpos_ref, fcat_ref, xyz_ref, xyzt_ref,
                     idxl_ref, idxc_ref, f0_ref, *outs, radius: float,
                     nsample: int, n_real: int, c: int, splits: int,
                     g_batch: int, w: int):
    # ws (1,1) i32 SMEM window start (multiple of 128); qpos (1,TM,1) i32
    # sorted-center pos; fcat (1,n_pad,splits*C) bf16 SORTED features;
    # xyz (1,n_pad,3) f32 SORTED; xyzt (1,3,n_pad) f32 SORTED transposed;
    # idxl (1,1,n_pad) i32 orig idx (lane layout); idxc (1,n_pad,1) i32
    # (sublane layout); f0 (1,1,C) f32 original row 0 (empty-ball row).
    (newxyz_ref, fi_ref, fmax_ref, fmin_ref, amax_ref, amin_ref,
     cnt_ref) = outs
    tm = qpos_ref.shape[1]
    K = nsample
    G = g_batch
    ws = ws_ref[pl.program_id(0), pl.program_id(1)] * 128

    xyz_w = xyz_ref[0, pl.ds(ws, w), :]                 # (W, 3) f32
    fcat_w = fcat_ref[0, pl.ds(ws, w), :]               # (W, S*C) bf16
    idx_row = idxl_ref[0, :, pl.ds(ws, w)]              # (1, W) i32
    idx_col = idxc_ref[0, pl.ds(ws, w), :]              # (W, 1) i32

    wlane = lax.broadcasted_iota(jnp.int32, (tm, w), 1)
    gpos = wlane + ws
    oh_q = (gpos == qpos_ref[0, :, 0][:, None]).astype(jnp.bfloat16)
    x_hi, x_mid, x_lo = _split3(xyz_w)
    q = _oh_matmul(oh_q, x_hi, x_mid, x_lo)             # (TM, 3) exact
    newxyz_ref[0] = q

    xt = xyzt_ref[0, :, pl.ds(ws, w)]                   # (3, W)
    dx = q[:, 0:1] - xt[0:1, :]
    dy = q[:, 1:2] - xt[1:2, :]
    dz = q[:, 2:3] - xt[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz
    inball = (d2 < jnp.float32(radius) ** 2) & (gpos < n_real)

    # exact first-K-in-ORIGINAL-index-order rank over the window: ONE bf16
    # matmul against the shared comparison matrix (0/1 products, f32 acc)
    cmpm = (idx_col <= idx_row).astype(jnp.bfloat16)    # (W, W)
    rank = jnp.dot(inball.astype(jnp.bfloat16), cmpm,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    count = jnp.sum(inball.astype(jnp.float32), axis=1,
                    keepdims=True).astype(jnp.int32)    # (TM, 1)
    ranked = jnp.where(inball, rank, 0)
    oh_first = (ranked == 1)

    rq = jnp.dot(oh_q, fcat_w, preferred_element_type=jnp.float32)
    rq_sum = rq[:, :c]
    for _s in range(1, splits):
        rq_sum = rq_sum + rq[:, _s * c:(_s + 1) * c]
    fi_ref[0] = rq_sum

    ohfb = oh_first.astype(jnp.bfloat16)
    rf = jnp.dot(ohfb, fcat_w, preferred_element_type=jnp.float32)
    g_first = rf[:, :c]
    for _s in range(1, splits):
        g_first = g_first + rf[:, _s * c:(_s + 1) * c]
    # empty ball: the reference groups original point[0] (CUDA memset rule)
    g_first = jnp.where(count > 0, g_first, f0_ref[0])

    fmax = jnp.full((tm, c), -jnp.inf, jnp.float32)
    fmin = jnp.full((tm, c), jnp.inf, jnp.float32)
    amax = jnp.zeros((tm, c), jnp.int32)
    amin = jnp.zeros((tm, c), jnp.int32)
    for k0 in range(0, K, G):
        kvals = (k0 + 1 + lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0))
        ohb = (ranked[None] == kvals).astype(jnp.bfloat16).reshape(
            G * tm, w)
        r = jnp.dot(ohb, fcat_w, preferred_element_type=jnp.float32)
        g = r[:, :c]
        for _s in range(1, splits):
            g = g + r[:, _s * c:(_s + 1) * c]
        for gi in range(G):
            k = k0 + gi
            gg = jnp.where(count > k, g[gi * tm:(gi + 1) * tm], g_first)
            upd = gg > fmax
            fmax = jnp.where(upd, gg, fmax)
            amax = jnp.where(upd, k, amax)
            und = gg < fmin
            fmin = jnp.where(und, gg, fmin)
            amin = jnp.where(und, k, amin)
    fmax_ref[0] = fmax
    fmin_ref[0] = fmin
    amax_ref[0] = amax
    amin_ref[0] = amin
    cnt_ref[0] = count


def _wbwd_max_kernel(ws_ref, qpos_ref, xyz_ref, xyzt_ref, idxl_ref, idxc_ref,
                     g_new_ref, g_fi_ref, g_fmax_ref, g_fmin_ref, amax_ref,
                     amin_ref, g_fx_ref, *, radius: float, nsample: int,
                     n_real: int, g_batch: int, splits: int, w: int):
    # g_fx (1, n_pad, 3+C) accumulated in SORTED row space; the caller
    # un-sorts it. Empty-ball centers contribute NOTHING here (their ranked
    # stays 0, matching no slot); the caller adds their f0-row term from
    # the saved counts — see _wbg_max_bwd.
    K = nsample
    G = g_batch
    tm = qpos_ref.shape[1]
    wcols = g_fx_ref.shape[2]
    c = wcols - 3
    ws = ws_ref[pl.program_id(0), pl.program_id(1)] * 128

    @pl.when(pl.program_id(1) == 0)
    def _init():
        g_fx_ref[0] = jnp.zeros_like(g_fx_ref[0])

    xyz_w = xyz_ref[0, pl.ds(ws, w), :]
    idx_row = idxl_ref[0, :, pl.ds(ws, w)]
    idx_col = idxc_ref[0, pl.ds(ws, w), :]

    wlane = lax.broadcasted_iota(jnp.int32, (tm, w), 1)
    gpos = wlane + ws
    oh_q = (gpos == qpos_ref[0, :, 0][:, None]).astype(jnp.bfloat16)
    x_hi, x_mid, x_lo = _split3(xyz_w)
    q = _oh_matmul(oh_q, x_hi, x_mid, x_lo)
    xt = xyzt_ref[0, :, pl.ds(ws, w)]
    dx = q[:, 0:1] - xt[0:1, :]
    dy = q[:, 1:2] - xt[1:2, :]
    dz = q[:, 2:3] - xt[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz
    inball = (d2 < jnp.float32(radius) ** 2) & (gpos < n_real)
    cmpm = (idx_col <= idx_row).astype(jnp.bfloat16)
    rank = jnp.dot(inball.astype(jnp.bfloat16), cmpm,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    count = jnp.sum(inball.astype(jnp.float32), axis=1,
                    keepdims=True).astype(jnp.int32)
    ranked = jnp.where(inball, rank, 0)

    g_fmax = g_fmax_ref[0]
    g_fmin = g_fmin_ref[0]
    amax = amax_ref[0]
    amin = amin_ref[0]

    acc = jnp.zeros((w, wcols), jnp.float32)
    for k0 in range(0, K, G):
        kvals = (k0 + 1 + lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0))
        oh = (ranked[None] == kvals).astype(jnp.bfloat16).reshape(
            G * tm, w)
        rows = []
        for gi in range(G):
            k = k0 + gi
            rhs = (jnp.where(amax == k, g_fmax, 0.0)
                   + jnp.where(amin == k, g_fmin, 0.0))
            rows.append(jnp.pad(rhs, ((0, 0), (3, 0))))
        gcat = jnp.concatenate(rows, axis=0)
        hi, mid, lo = _split3(gcat)
        parts = (hi, mid, lo)[:splits]
        dn = (((0,), (0,)), ((), ()))
        for part in parts:
            acc += lax.dot_general(oh, part, dn,
                                   preferred_element_type=jnp.float32)
    gq = jnp.concatenate([g_new_ref[0], g_fi_ref[0]], axis=1)
    acc += _oh_matmul(oh_q.T, *_split3(gq))
    g_fx_ref[0, pl.ds(ws, w), :] = g_fx_ref[0, pl.ds(ws, w), :] + acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 5, 6, 7))
def ball_group_maxpool_windowed(radius: float, nsample: int, xyz, query_idx,
                                feats, splits: int = 1, grad_splits: int = 1,
                                tm: int = 256):
    """Windowed twin of ballgroup.ball_group_maxpool_pallas (same outputs,
    same gradient tie semantics). The caller must have verified
    window_prep(...)['ok'] (or wrap in lax.cond with the full kernel)."""
    out, _ = _wbg_max_fwd(radius, nsample, xyz, query_idx, feats, splits,
                          grad_splits, tm)
    return out


def _wbg_max_call(radius, nsample, xyz, query_idx, feats, splits, tm, w,
                  prep):
    B, N, _ = xyz.shape
    M = query_idx.shape[1]
    C = feats.shape[-1]
    K = nsample
    n_pad = _round_up(N, 128)
    T = M // tm

    feats_s = _gather_rows(feats, prep["order"])
    parts = [jax.lax.optimization_barrier(feats_s.astype(jnp.bfloat16))]
    if splits >= 2:
        r1 = feats_s - parts[0].astype(jnp.float32)
        parts.append(jax.lax.optimization_barrier(r1.astype(jnp.bfloat16)))
        if splits >= 3:
            parts.append(jax.lax.optimization_barrier(
                (r1 - parts[1].astype(jnp.float32)).astype(jnp.bfloat16)))
    fcat = jnp.concatenate(parts, axis=-1) if splits > 1 else parts[0]
    xyz_s = prep["xyz_s"]
    if n_pad != N:
        xyz_s = jnp.pad(xyz_s, ((0, 0), (0, n_pad - N), (0, 0)))
        fcat = jnp.pad(fcat, ((0, 0), (0, n_pad - N), (0, 0)))
    xyzt = jnp.transpose(xyz_s, (0, 2, 1))
    idx_pad = jnp.pad(prep["order"], ((0, 0), (0, n_pad - N)),
                      constant_values=2 ** 30) if n_pad != N else prep["order"]
    f0 = feats[:, 0:1, :]                                  # (B, 1, C)
    g_batch = _pick_g(K, tm, w, _round_up(C, 128))

    win_full = prep["win"]
    kernel = functools.partial(
        _wfwd_max_kernel, radius=float(radius), nsample=K, n_real=N, c=C,
        splits=splits, g_batch=g_batch, w=w)
    outs = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(win_full.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tm, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, splits * C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec(shape, lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM)
            for shape in [(1, tm, 3), (1, tm, C), (1, tm, C), (1, tm, C),
                          (1, tm, C), (1, tm, C), (1, tm, 1)]),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, M, C), jnp.float32),
            jax.ShapeDtypeStruct((B, M, C), jnp.float32),
            jax.ShapeDtypeStruct((B, M, C), jnp.float32),
            jax.ShapeDtypeStruct((B, M, C), jnp.int32),
            jax.ShapeDtypeStruct((B, M, C), jnp.int32),
            jax.ShapeDtypeStruct((B, M, 1), jnp.int32),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(win_full, prep["qpos"][:, :, None], fcat, xyz_s, xyzt,
      idx_pad[:, None, :], idx_pad[:, :, None], f0)
    return outs


def _wbg_max_fwd(radius, nsample, xyz, query_idx, feats, splits, grad_splits,
                 tm):
    M = query_idx.shape[1]
    n_pad = _round_up(xyz.shape[1], 128)
    w = pick_window(n_pad, radius, M, tm)
    prep = window_prep(xyz, query_idx, radius, tm, w)
    new_xyz_p, fi_p, fmax_p, fmin_p, amax, amin, cnt = _wbg_max_call(
        radius, nsample, xyz, query_idx, feats, splits, tm, w, prep)
    # un-permute center outputs back to query order
    cinv = prep["cinv"]
    unp = lambda a: _gather_rows(a, cinv)
    out = (unp(new_xyz_p), unp(fi_p), unp(fmax_p), unp(fmin_p))
    res = (xyz, feats.shape[-1], query_idx, amax, amin, cnt, prep)
    return out, res


def _wbg_max_bwd(radius, nsample, splits, grad_splits, tm, res, grads):
    xyz, c, query_idx, amax, amin, cnt, prep = res
    B, N, _ = xyz.shape
    M = query_idx.shape[1]
    K = nsample
    n_pad = _round_up(N, 128)
    w = pick_window(n_pad, radius, M, tm)
    T = M // tm
    # re-permute cotangents into the kernel's center order
    cperm = prep["cperm"]
    per = lambda a: _gather_rows(a.astype(jnp.float32), cperm)
    g_new, g_fi, g_fmax, g_fmin = [per(g) for g in grads]

    xyz_s = prep["xyz_s"]
    if n_pad != N:
        xyz_s = jnp.pad(xyz_s, ((0, 0), (0, n_pad - N), (0, 0)))
    xyzt = jnp.transpose(xyz_s, (0, 2, 1))
    idx_pad = jnp.pad(prep["order"], ((0, 0), (0, n_pad - N)),
                      constant_values=2 ** 30) if n_pad != N else prep["order"]
    g_batch = _pick_g(K, tm, w, _round_up(c + 3, 128))
    win_full = prep["win"]
    kernel = functools.partial(_wbwd_max_kernel, radius=float(radius),
                               nsample=K, n_real=N, g_batch=g_batch,
                               splits=grad_splits, w=w)
    g_fx_s = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(win_full.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tm, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, tm, d), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
             for d in (3, c, c, c, c, c)],
        out_specs=pl.BlockSpec((1, n_pad, c + 3), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, c + 3), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(win_full, prep["qpos"][:, :, None], xyz_s, xyzt,
      idx_pad[:, None, :], idx_pad[:, :, None], g_new, g_fi, g_fmax,
      g_fmin, amax, amin)
    # un-sort the accumulated gradient back to original row order
    g_fx = _gather_rows(g_fx_s[:, :N], prep["inv"])
    g_xyz, g_feats = g_fx[..., :3], g_fx[..., 3:]
    # empty-ball term: every channel of an empty center outputs the f0 row
    # for BOTH max and min, so its cotangent sums into feats row 0 (the
    # kernel matched no slot for these centers — ranked stayed 0)
    empty = (cnt == 0).astype(jnp.float32)                 # (B, M, 1)
    g0 = jnp.sum((g_fmax + g_fmin) * empty, axis=1)        # (B, C)
    g_feats = g_feats.at[:, 0, :].add(g0)
    return g_xyz, None, g_feats


ball_group_maxpool_windowed.defvjp(_wbg_max_fwd, _wbg_max_bwd)
