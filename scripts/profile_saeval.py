"""Per-stage saeval + FPS re-measurement at B=32 (chained, axon rules)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.ops import furthest_point_sample
from adaptpoint_tpu.ops.pallas.saeval import sa_eval_pallas


def slope_chain(fn, x0, lo=3, hi=9):
    y = fn(x0)
    np.asarray(jax.tree.leaves(y)[0])

    def run(k):
        y = x0
        t0 = time.perf_counter()
        for _ in range(k):
            y = fn(y)
        np.asarray(jax.tree.leaves(y)[0])
        return time.perf_counter() - t0

    run(2)
    return (run(hi) - run(lo)) / (hi - lo) * 1e3


def main():
    B = 32
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)

    # re-measure the fps 1200 anomaly, 3 reps each
    for rep in range(3):
        for (N, M) in [(2048, 1024), (2048, 1200)]:
            xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)

            @jax.jit
            def step(x, m=M):
                idx = furthest_point_sample(x, m)
                return x + 1e-30 * jnp.sum(idx.astype(jnp.float32))

            t = slope_chain(step, xyz)
            print(f"rep{rep} fps N={N} -> {M}: {t:7.2f} ms", flush=True)

    # saeval stages at PointNeXt-S eval shapes (B=32)
    # stage: (N, M, K, R, Cin, mid, cout)
    stages = [(2048, 512, 32, 0.15, 32, 32, 64),
              (512, 128, 32, 0.3, 64, 64, 128),
              (128, 32, 32, 0.6, 128, 128, 256),
              (32, 8, 32, 1.2, 256, 256, 512)]
    for (N, M, K, R, C, mid, cout) in stages:
        xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        qidx = jnp.asarray(np.stack(
            [np.sort(rng.permutation(N)[:M]) for _ in range(B)]), jnp.int32)
        w1 = jnp.asarray(rng.standard_normal((C + 3, mid)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((mid,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((mid, cout)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)

        @jax.jit
        def step(x, q=qidx, f=feats, r=R, k=K, w1=w1, b1=b1, w2=w2, b2=b2):
            new_xyz, fi, out = sa_eval_pallas(r, k, x, q, f, w1, b1, w2, b2,
                                              relative=True)
            return x + 1e-30 * (jnp.sum(out[0, 0]) + jnp.sum(fi[0, 0])
                                + jnp.sum(new_xyz[0, 0]))

        t = slope_chain(step, xyz)
        print(f"saeval N={N:5d} M={M:4d} C={C:4d}->{cout:4d}: {t:7.2f} ms",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
