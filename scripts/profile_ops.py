"""Per-op timing on TPU at PointNeXt-S shapes to locate the bottleneck."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.ops import (ball_query, index_points, knn_point,
                                three_interpolation)
from adaptpoint_tpu.ops.pallas.fps import furthest_point_sample_pallas


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:45s} {dt:8.3f} ms")
    return dt


def main():
    B = 128
    rng = np.random.default_rng(0)
    total = 0.0
    # PointNeXt-S stages at N=1024 input: (support N, sampled M, nsample, C)
    stages = [(1024, 512, 32, 64), (512, 256, 32, 128),
              (256, 128, 32, 256), (128, 64, 32, 512)]
    for (N, M, K, C) in stages:
        xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((B, N, C // 2)), jnp.float32)

        t = timeit(f"fps       N={N:5d}->{M:4d}",
                   lambda a=xyz, m=M: furthest_point_sample_pallas(a, m))
        total += t
        idxM = furthest_point_sample_pallas(xyz, M)
        new_xyz = index_points(xyz, idxM)
        t = timeit(f"ballquery N={N:5d} M={M:4d} K={K}",
                   lambda a=xyz, b=new_xyz: ball_query(0.15, K, a, b))
        total += t
        idx = ball_query(0.15, K, xyz, new_xyz)
        t = timeit(f"group     N={N:5d} M={M:4d} K={K} C={C//2}",
                   lambda f=feats, i=idx: index_points(f, i))
        total += t

        @jax.jit
        def grouped_mlp(f, i, w):
            fj = index_points(f, i)  # (B,M,K,C/2)
            return jnp.max(jnp.dot(fj, w, preferred_element_type=jnp.float32),
                           axis=2)

        w = jnp.asarray(rng.standard_normal((C // 2, C)), jnp.float32) * 0.1
        t = timeit(f"groupmlp  N={N:5d} M={M:4d} K={K} {C//2}->{C}",
                   grouped_mlp, feats, idx, w)
        total += t
    print(f"{'TOTAL hot ops':45s} {total:8.3f} ms  "
          f"(batch of {B}: {B/total*1000:.0f} clouds/s bound)")


if __name__ == "__main__":
    main()
