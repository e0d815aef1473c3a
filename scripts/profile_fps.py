"""Quantify FPS + ball-group + saeval cost at the B=32 protocol shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.ops import furthest_point_sample, ball_group


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

    for (N, M) in [(2048, 4), (2048, 512), (2048, 1024), (2048, 1200),
                   (1024, 256), (1024, 512), (512, 128), (512, 256),
                   (256, 128), (128, 32), (128, 64), (64, 32), (32, 8)]:
        xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)

        @jax.jit
        def step(x, m=M):
            idx = furthest_point_sample(x, m)
            # chain: perturb x by a value depending on idx
            return x + 1e-30 * jnp.sum(idx.astype(jnp.float32))

        t = slope_chain(step, xyz)
        print(f"fps N={N:5d} -> {M:5d}: {t:7.2f} ms", flush=True)

    # classifier SA ball_group shapes (PointNeXt-S on 2048 pts, strides 4)
    for (N, M, K, R, C) in [(2048, 512, 32, 0.15, 32), (512, 128, 32, 0.3, 64),
                            (128, 32, 32, 0.6, 128), (32, 8, 32, 1.2, 256)]:
        xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        qidx = jnp.asarray(np.stack(
            [np.sort(rng.permutation(N)[:M]) for _ in range(B)]), jnp.int32)

        @jax.jit
        def step(x, q=qidx, f=feats, r=R, k=K):
            _, fi, dpfj, _ = ball_group(r, k, x, q, f, relative=True)
            return x + 1e-30 * (jnp.sum(dpfj[0, 0, 0]) + jnp.sum(fi[0, 0]))

        t = slope_chain(step, xyz)
        print(f"ballgroup fwd N={N:5d} M={M:5d} C={C:4d}: {t:7.2f} ms",
              flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
