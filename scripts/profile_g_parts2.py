"""Chained micro-bench of G sub-ops at B=32 (axon timing rules)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from adaptpoint_tpu.ops import ball_group
from adaptpoint_tpu.ops import _ball_group_xla
from adaptpoint_tpu.adapt.augmentor import AnchorSelfAttention


def slope_chain(fn, x0, lo=3, hi=9):
    """fn: x -> x' (same shape). Chained, host-fetch at end."""
    y = fn(x0)
    np.asarray(y)

    def run(k):
        y = x0
        t0 = time.perf_counter()
        for _ in range(k):
            y = fn(y)
        np.asarray(y)
        return time.perf_counter() - t0

    run(2)
    return (run(hi) - run(lo)) / (hi - lo) * 1e3


def main():
    B = 32
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    stages = [(2048, 1024, 24, 0.1, 128),
              (1024, 512, 24, 0.2, 256),
              (512, 256, 24, 0.4, 512),
              (256, 128, 24, 0.8, 1024)]

    for mode, bg in (("pallas", ball_group), ("xla", _ball_group_xla)):
        tot = 0.0
        for (N, M, K, R, C) in stages:
            xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
            feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
            qidx = jnp.asarray(np.stack(
                [np.sort(rng.permutation(N)[:M]) for _ in range(B)]),
                jnp.int32)

            def step(x, q=qidx, f=feats, r=R, k=K, fn=bg):
                out = fn(r, k, x, q, f, relative=False)
                dpfj = out[2] if len(out) == 4 else out[2]
                return x + 1e-30 * (jnp.sum(dpfj[..., 3:].max(axis=1))
                                    + jnp.sum(out[0]))

            t = slope_chain(jax.jit(step), xyz)
            tot += t
            print(f"{mode:6s} stage N={N:5d} M={M:4d} C={C:4d}: {t:6.2f} ms",
                  flush=True)
        print(f"{mode:6s} TOTAL: {tot:6.2f} ms", flush=True)

    # mask attention chained: x -> attn(x) shape-preserving
    x = jnp.asarray(rng.standard_normal((B, 2048, 64)), jnp.float32)
    xyz = jnp.asarray(rng.standard_normal((B, 2048, 3)), jnp.float32)
    attn = AnchorSelfAttention(64, 4)
    av = attn.init(key, x, xyz, False)
    f_attn = jax.jit(lambda x: attn.apply(av, x, xyz, False))
    print(f"mask attention (2048,64) fwd: {slope_chain(f_attn, x):6.2f} ms",
          flush=True)

    def attn_fb(xx):
        def loss(z):
            return jnp.sum(attn.apply(av, z, xyz, False) ** 2)
        g = jax.grad(loss)(xx)
        return xx + 1e-30 * g
    print(f"mask attention fwd+bwd:       "
          f"{slope_chain(jax.jit(attn_fb), x):6.2f} ms", flush=True)

    # conv stack f32 vs bf16 (chained through first layer input)
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        layers = []
        xx = jnp.asarray(rng.standard_normal((B, 2048, 64)), jnp.float32)
        params = []
        shapes = [(2048, 64, 128), (1024, 128, 256), (512, 256, 512),
                  (256, 512, 1024)]
        ws = [jnp.asarray(rng.standard_normal((ci, co)) * 0.02, dt)
              for (_, ci, co) in shapes]

        def convs(x, ws=ws, dt=dt):
            acc = 0.0
            for (N, ci, co), w in zip(shapes, ws):
                # derive a (B,N,ci) input from x so nothing constant-folds
                h = jnp.broadcast_to(x[:, :N, :1], (x.shape[0], N, ci))
                y = jnp.dot(h.astype(dt), w, preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(nn.relu(y))
            return x + 1e-30 * acc

        print(f"conv stack {name}: {slope_chain(jax.jit(convs), xx):6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
