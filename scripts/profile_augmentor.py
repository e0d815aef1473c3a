"""Bisect the augmentor (G) forward cost at the reference protocol
(B=128, N=2048): embedding, each PointsetGrouper stage, FP decode, mask
attention, ProduceFactor, transform+kernel-regression tail. Chained,
slope-based (axon rules). Run alone."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.adapt.augmentor import (AnchorSelfAttention,
                                            PointsetGrouper, ProduceFactor,
                                            AdaptPoint_Augmentor)


def slope(name, step, x0, lo=3, hi=9):
    x = step(x0)
    np.asarray(jax.tree.leaves(x)[0])

    def run(k):
        y = x0
        t0 = time.perf_counter()
        for _ in range(k):
            y = step(y)
        np.asarray(jax.tree.leaves(y)[0])
        return time.perf_counter() - t0

    run(2)
    dt = (run(hi) - run(lo)) / (hi - lo) * 1e3
    print(f"  {name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    print(f"backend={jax.default_backend()} B={B} N={N}", flush=True)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32) * 0.5

    # full augmentor fwd
    aug = AdaptPoint_Augmentor()
    rngs = {"params": jax.random.PRNGKey(0), "wolf": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    v = aug.init(rngs, pos, training=True)

    @jax.jit
    def full(p):
        (xyz, gen), _ = aug.apply(
            v, p, training=True, mutable=["batch_stats"],
            rngs={"wolf": jax.random.PRNGKey(1),
                  "gumbel": jax.random.PRNGKey(2)})
        return gen
    slope("G fwd full", full, pos)

    # per-stage groupers (matching SAComponent dims: 64*2^i, radii, k=24)
    radii = [0.1, 0.2, 0.4, 0.8]
    chans = [128, 256, 512, 1024]
    xyz = pos
    feats = jnp.asarray(rng.standard_normal((B, N, 64)), jnp.float32)
    last = 64
    for i in range(4):
        g = PointsetGrouper(chans[i], 2, 24, radii[i])
        fstage = jnp.asarray(
            rng.standard_normal((B, xyz.shape[1], chans[i])), jnp.float32)
        gv = g.init(jax.random.PRNGKey(i), xyz, fstage, training=False)

        @jax.jit
        def step(p, g=g, gv=gv, fstage=fstage):
            nxyz, nfeat = g.apply(gv, p, fstage, training=False)
            # shape-preserving chain: perturb the input by a grad-free scalar
            return p + 1e-30 * jnp.sum(nfeat)

        slope(f"grouper{i} N={xyz.shape[1]} C={chans[i]}", step, xyz)
        n2 = xyz.shape[1] // 2
        xyz = xyz[:, :n2]

    # mask attention at full N
    attn = AnchorSelfAttention(64, 4)
    f64 = jnp.asarray(rng.standard_normal((B, N, 64)), jnp.float32)
    av = attn.init(jax.random.PRNGKey(9), f64, pos, training=False)

    @jax.jit
    def astep(x):
        return attn.apply(av, x, pos, training=False)
    slope(f"mask self-attn N={N}", astep, f64)


if __name__ == "__main__":
    main()
