"""A/B the fused 3-NN weighted-interpolation kernel (ops/pallas/fpinterp)
vs the composite gather+weight+sum at the four augmentor FP-decode shapes
and the PointNeXt seg-decoder shapes, fwd and fwd+bwd, on the real chip.

Also verifies fwd/VJP parity at every timed shape before timing.

Run: python scripts/check_fpinterp.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.ops.geometry import index_points
from adaptpoint_tpu.ops.pallas.fpinterp import (weighted_gather3,
                                                weighted_gather3_fits)


def _time(fn, *args, iters=40):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def composite(feat, idx, w):
    return jnp.sum(index_points(feat, idx) * w[..., None], axis=2)


def main():
    rng = np.random.default_rng(7)
    print(f"backend: {jax.default_backend()}")
    # (B, N_unknown, M_known, C): augmentor FP decode at B=32 N=2048,
    # then the same at B=128 (batch study), then eval decoder shapes
    shapes = [
        (32, 2048, 1024, 128),
        (32, 1024, 512, 256),
        (32, 512, 256, 512),
        (32, 256, 128, 1024),
        (128, 2048, 1024, 128),
    ]
    for B, N, M, C in shapes:
        fits = weighted_gather3_fits(N, M, C)
        feat = jnp.asarray(rng.standard_normal((B, M, C)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, M, size=(B, N, 3)), jnp.int32)
        w = rng.random((B, N, 3)).astype(np.float32) + 1e-3
        w = jnp.asarray(w / w.sum(-1, keepdims=True))
        if not fits:
            print(f"B={B} N={N} M={M} C={C}: does not fit, skipped")
            continue

        f_fused = jax.jit(weighted_gather3)
        f_comp = jax.jit(composite)
        err = float(jnp.abs(f_fused(feat, idx, w)
                            - f_comp(feat, idx, w)).max())

        def loss_fused(feat, w, idx=idx):
            return jnp.sum(jnp.sin(weighted_gather3(feat, idx, w)))

        def loss_comp(feat, w, idx=idx):
            return jnp.sum(jnp.sin(composite(feat, idx, w)))

        g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))
        g_comp = jax.jit(jax.grad(loss_comp, argnums=(0, 1)))
        gf, gr = g_fused(feat, w), g_comp(feat, w)
        gerr = max(
            float(jnp.abs(gf[0].astype(jnp.float32)
                          - gr[0].astype(jnp.float32)).max()),
            float(jnp.abs(gf[1] - gr[1]).max()))

        tf = _time(f_fused, feat, idx, w)
        tc = _time(f_comp, feat, idx, w)
        tgf = _time(g_fused, feat, w)
        tgc = _time(g_comp, feat, w)
        print(f"B={B} N={N} M={M} C={C}: fwd {tf:6.3f} vs {tc:6.3f} ms "
              f"({tc / tf:4.2f}x)  fwd+bwd {tgf:6.3f} vs {tgc:6.3f} ms "
              f"({tgc / tgf:4.2f}x)  err {err:.2e} gerr {gerr:.2e}")


if __name__ == "__main__":
    main()
