"""Chained fwd+bwd micro-bench of G sub-ops at B=32 (finding the 53 ms)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.ops import ball_group, three_interpolation
from adaptpoint_tpu.adapt.augmentor import AnchorSelfAttention


def slope_chain(fn, x0, lo=3, hi=9):
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
    a, b = run(lo), run(hi)
    return (b - a) / (hi - lo) * 1e3


def main():
    B = 32
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # 1. ballgroup fwd+bwd per stage (splits=1 like the augmentor)
    stages = [(2048, 1024, 24, 0.1, 128), (1024, 512, 24, 0.2, 256),
              (512, 256, 24, 0.4, 512), (256, 128, 24, 0.8, 1024)]
    tot = 0.0
    for (N, M, K, R, C) in stages:
        xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        qidx = jnp.asarray(np.stack(
            [np.sort(rng.permutation(N)[:M]) for _ in range(B)]), jnp.int32)

        def step(x, q=qidx, f=feats, r=R, k=K):
            def loss(xx, ff):
                nx, fi, dpfj, _ = ball_group(r, k, xx, q, ff,
                                             relative=False, splits=1,
                                             grad_splits=1)
                return jnp.sum(jnp.max(dpfj[..., 3:], axis=1)) + jnp.sum(nx)
            l, (gx, gf) = jax.value_and_grad(loss, argnums=(0, 1))(x, f)
            return x + 1e-30 * (l + jnp.sum(gx) + jnp.sum(gf))

        t = slope_chain(jax.jit(step), xyz)
        tot += t
        print(f"ballgroup f+b s1 N={N:5d} C={C:4d}: {t:6.2f} ms", flush=True)
    print(f"ballgroup f+b TOTAL: {tot:6.2f} ms", flush=True)

    # 2. three_interpolation fwd+bwd at the FP shapes
    tot = 0.0
    for (N2, N1, C2) in [(128, 256, 1024), (256, 512, 512),
                         (512, 1024, 256), (1024, 2048, 128)]:
        xyz1 = jnp.asarray(rng.standard_normal((B, N1, 3)), jnp.float32)
        xyz2 = jnp.asarray(rng.standard_normal((B, N2, 3)), jnp.float32)
        p2 = jnp.asarray(rng.standard_normal((B, N2, C2)), jnp.float32)

        def step(x, x2=xyz2, p=p2):
            def loss(xx, pp):
                return jnp.sum(three_interpolation(xx, x2, pp) ** 2)
            l, (g1, g2) = jax.value_and_grad(loss, argnums=(0, 1))(x, p)
            return x + 1e-30 * (l + jnp.sum(g1) + jnp.sum(g2))

        t = slope_chain(jax.jit(step), xyz1)
        tot += t
        print(f"three_interp f+b N1={N1:5d} C={C2:4d}: {t:6.2f} ms",
              flush=True)
    print(f"three_interp f+b TOTAL: {tot:6.2f} ms", flush=True)

    # 3. mask attention fwd and fwd+bwd at (32,2048,64)
    x = jnp.asarray(rng.standard_normal((B, 2048, 64)), jnp.float32)
    xyz = jnp.asarray(rng.standard_normal((B, 2048, 3)), jnp.float32)
    attn = AnchorSelfAttention(64, 4)
    av = attn.init(key, x, xyz, False)

    def fwd(z):
        o = attn.apply(av, z, xyz, False)
        return z + 1e-30 * jnp.sum(o)

    print(f"attention fwd:     {slope_chain(jax.jit(fwd), x):6.2f} ms",
          flush=True)

    def fb(z):
        def loss(zz, p):
            return jnp.sum(attn.apply({"params": p,
                                       "batch_stats": av["batch_stats"]},
                                      zz, xyz, False) ** 2)
        l, (gz, gp) = jax.value_and_grad(loss, argnums=(0, 1))(z, av["params"])
        return z + 1e-30 * (l + jnp.sum(gz) + jnp.sum(jax.tree.leaves(gp)[0]))

    print(f"attention fwd+bwd: {slope_chain(jax.jit(fb), x):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
