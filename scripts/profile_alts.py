"""Quick alternatives measurement: approx_min_k ball query, onehot-matmul gather."""
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

from adaptpoint_tpu.ops.geometry import square_distance
from adaptpoint_tpu.ops import ball_query, index_points
from adaptpoint_tpu.ops.pallas.fps import furthest_point_sample_pallas


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)
    return out


def main():
    B, N, M, K, C = 128, 1024, 512, 32, 32
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    idxM = furthest_point_sample_pallas(xyz, M)
    new_xyz = index_points(xyz, idxM)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

    @jax.jit
    def bq_exact(a, b):
        return ball_query(0.15, K, a, b)

    @jax.jit
    def bq_approx(a, b):
        d2 = square_distance(b, a)
        arr = lax.broadcasted_iota(jnp.int32, d2.shape, 2)
        key = jnp.where(d2 < 0.15 ** 2, arr, arr + N).astype(jnp.float32)
        vals, idx = lax.approx_min_k(key, K, recall_target=0.95)
        first = idx[..., :1]
        return jnp.where(vals < N, idx, first).astype(jnp.int32)

    e = timeit("ball_query exact (top_k sort)", bq_exact, xyz, new_xyz)
    a = timeit("ball_query approx_min_k", bq_approx, xyz, new_xyz)
    # agreement
    same = float((np.sort(np.asarray(e), -1) == np.sort(np.asarray(a), -1)).mean())
    print(f"agreement (sorted idx): {same:.4f}")

    idx = e

    @jax.jit
    def gather_xla(f, i):
        return index_points(f, i)

    timeit("gather XLA take_along_axis", gather_xla, feats, idx)

    @jax.jit
    def gather_onehot_chunked(f, i):
        # chunk M to bound the onehot size; bf16 onehot, f32 accum
        TM = 64
        def chunk(c):
            ic = lax.dynamic_slice_in_dim(i, c * TM, TM, axis=1)  # (B,TM,K)
            oh = jax.nn.one_hot(ic.reshape(B, TM * K), N, dtype=jnp.bfloat16)
            g = jnp.einsum("bqn,bnc->bqc", oh, f.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return g.reshape(B, TM, K, C)
        outs = [chunk(c) for c in range(M // TM)]
        return jnp.concatenate(outs, axis=1)

    g2 = timeit("gather onehot bf16 matmul (chunked)", gather_onehot_chunked,
                feats, idx)
    g1 = gather_xla(feats, idx)
    err = float(jnp.max(jnp.abs(g1 - g2)))
    print(f"onehot gather max err: {err:.6f}")


if __name__ == "__main__":
    main()
