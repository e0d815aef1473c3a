"""Ablate the ballgroup fwd kernel to find its real bottleneck.

Variants (all at the CLS-stage1 shape B=32 N=2048 M=512 C=32 K=32 splits=1):
  full     — faithful copy of the production kernel
  nolane   — skip the lane_2 index matmul (no idx output)
  nostore  — single dpfj store instead of K
  nogather — skip the fcat gather matmul (keep everything else)
  norank   — replace rank computation with a dummy (keep gathers)
  g16      — g_batch 16 instead of 8
  tm128    — tile 128 instead of 256
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qidx_ref, fcat_ref, xyzt_ref, xyz_ref, newxyz_ref, dpfj_ref,
            idx_ref, *, radius, K, n_real, w, G, variant):
    n_pad = fcat_ref.shape[1]
    tm = qidx_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (tm, n_pad), 1)

    def split3(x):
        hi = x.astype(jnp.bfloat16)
        r1 = x - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, mid, lo

    x_hi, x_mid, x_lo = split3(xyz_ref[0])
    oh_q = (lane == qidx_ref[0, :, 0][:, None]).astype(jnp.bfloat16)
    q = (jnp.dot(oh_q, x_hi, preferred_element_type=jnp.float32)
         + jnp.dot(oh_q, x_mid, preferred_element_type=jnp.float32)
         + jnp.dot(oh_q, x_lo, preferred_element_type=jnp.float32))
    newxyz_ref[0] = q

    xt = xyzt_ref[0]
    dx = q[:, 0:1] - xt[0:1, :]
    dy = q[:, 1:2] - xt[1:2, :]
    dz = q[:, 2:3] - xt[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz
    inball = (d2 < jnp.float32(radius) ** 2) & (lane < n_real)

    if variant == "norank":
        ranked = jnp.where(inball, 1, 0)
        count = jnp.ones((tm, 1), jnp.int32)
    else:
        CH = 128
        mb = inball.astype(jnp.bfloat16)
        tril = (lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
                <= lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
                ).astype(jnp.bfloat16)
        chunks = []
        carry = jnp.zeros((tm, 1), jnp.float32)
        for cc in range(n_pad // CH):
            r = jnp.dot(mb[:, cc * CH:(cc + 1) * CH], tril,
                        preferred_element_type=jnp.float32) + carry
            chunks.append(r)
            carry = r[:, CH - 1:CH]
        rank = jnp.concatenate(chunks, axis=1).astype(jnp.int32)
        count = carry.astype(jnp.int32)
        ranked = jnp.where(inball, rank, 0)
    oh_first = (ranked == 1).astype(jnp.int32)
    oh_first = jnp.where(count > 0, oh_first, (lane == 0).astype(jnp.int32))

    fcat = fcat_ref[0]
    lane_row = lax.broadcasted_iota(jnp.int32, (1, n_pad), 1).astype(
        jnp.float32)
    lr_hi = lane_row.astype(jnp.bfloat16)
    lr_lo = (lane_row - lr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    lane_2 = jnp.concatenate([lr_hi, lr_lo], axis=0)

    colw = lax.broadcasted_iota(jnp.int32, (1, w), 1)
    q_wide = (jnp.where(colw == 0, q[:, 0:1], 0.0)
              + jnp.where(colw == 1, q[:, 1:2], 0.0)
              + jnp.where(colw == 2, q[:, 2:3], 0.0))

    kidx = lax.broadcasted_iota(jnp.int32, (tm, K), 1)
    idxacc = jnp.zeros((tm, K), jnp.int32)

    ohfb = oh_first.astype(jnp.bfloat16)
    rf = jnp.dot(ohfb, fcat, preferred_element_type=jnp.float32)
    g_first = rf[:, :w]
    rsf = lax.dot_general(ohfb, lane_2, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
    sel_first = (rsf[:, 0:1] + rsf[:, 1:2]).astype(jnp.int32)

    for k0 in range(0, K, G):
        kvals = (k0 + 1 + lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0))
        ohb = (ranked[None] == kvals).astype(jnp.bfloat16).reshape(
            G * tm, n_pad)
        if variant == "nogather":
            g = jnp.zeros((G * tm, w), jnp.float32) + jnp.sum(ohb[:, :1])
        else:
            r = jnp.dot(ohb, fcat, preferred_element_type=jnp.float32)
            g = r[:, :w]
        if variant == "nolane":
            sel_i = jnp.zeros((G * tm, 1), jnp.int32)
        else:
            rs = lax.dot_general(ohb, lane_2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            sel_i = (rs[:, 0:1] + rs[:, 1:2]).astype(jnp.int32)
        for gi in range(G):
            k = k0 + gi
            gk = jnp.where(count > k, g[gi * tm:(gi + 1) * tm], g_first)
            gk = (gk - q_wide)
            if variant == "nostore":
                if k == K - 1:
                    dpfj_ref[0, pl.ds(0, 1), :, :] = gk[None]
            else:
                dpfj_ref[0, pl.ds(k, 1), :, :] = gk[None]
            sk = jnp.where(count > k, sel_i[gi * tm:(gi + 1) * tm],
                           sel_first)
            idxacc = jnp.where(kidx == k, sk, idxacc)
    idx_ref[0] = idxacc


def build(variant, B, N, M, C, K, radius, tm, G):
    w = C + 3
    n_pad = N
    kernel = functools.partial(_kernel, radius=radius, K=K, n_real=N, w=w,
                               G=G, variant=variant)

    @jax.jit
    def call(xyz, qidx, fcat):
        xyzt = jnp.transpose(xyz, (0, 2, 1))
        return pl.pallas_call(
            kernel,
            grid=(B, M // tm),
            in_specs=[
                pl.BlockSpec((1, tm, 1), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, C + 3), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, n_pad), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, 3), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tm, 3), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, tm, w), lambda b, t: (b, 0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tm, K), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, M, 3), jnp.float32),
                jax.ShapeDtypeStruct((B, K, M, w), jnp.float32),
                jax.ShapeDtypeStruct((B, M, K), jnp.int32),
            ),
        )(qidx[:, :, None], fcat, xyzt, xyz)

    return call


def slope(fn, args, lo=4, hi=12):
    """Chained on xyz so the remote execution cache cannot short-circuit."""
    xyz0, qidx, fcat = args

    @jax.jit
    def step(x):
        nx, dpfj, idx = fn(x, qidx, fcat)
        return x + 1e-30 * (jnp.sum(nx[0, 0]) + jnp.sum(dpfj[0, 0, 0])
                            + jnp.sum(idx.astype(jnp.float32)[0, 0]))

    x = step(xyz0)
    np.asarray(x)

    def run(k):
        y = xyz0
        t0 = time.perf_counter()
        for _ in range(k):
            y = step(y)
        np.asarray(y)
        return time.perf_counter() - t0

    run(2)
    return (run(hi) - run(lo)) / (hi - lo) * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    B, N, M, C, K, R = 32, 2048, 512, 32, 32, 0.15
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)) * 0.5, jnp.float32)
    qidx = jnp.asarray(np.stack(
        [np.sort(rng.permutation(N)[:M]) for _ in range(B)]), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    fcat = jnp.concatenate([xyz, feats], -1).astype(jnp.bfloat16)

    import sys as _sys
    only = _sys.argv[1:] or None
    cases = [("full", 256, 8), ("nolane", 256, 8), ("nostore", 256, 8),
             ("nogather", 256, 8), ("norank", 256, 8), ("full", 128, 8)]
    for variant, tm, G in cases:
        if only and variant not in only:
            continue
        try:
            fn = build(variant, B, N, M, C, K, R, tm, G)
            t = slope(fn, (xyz, qidx, fcat))
            print(f"{variant:9s} tm={tm:3d} G={G:2d}: {t:7.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"{variant:9s} tm={tm:3d} G={G:2d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
