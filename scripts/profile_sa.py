"""Bisect the SetAbstraction stage cost on TPU."""
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

from adaptpoint_tpu.models.backbone.pointnext import SetAbstraction
from adaptpoint_tpu.ops import ball_query, furthest_point_sample, index_points
from adaptpoint_tpu.models.layers.group_layers import get_aggregation_features


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)


def main():
    B, N, C = 128, 1024, 32
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

    sa = SetAbstraction(
        in_channels=C, out_channels=64, layers=2, stride=2,
        group_args={"NAME": "ballquery", "radius": 0.15, "nsample": 32,
                    "normalize_dp": True},
        norm_args={"norm": "bn"}, act_args={"act": "relu"},
        conv_args={"order": "conv-norm-act"}, use_res=True)
    variables = sa.init(jax.random.PRNGKey(0), pos, f, training=False)
    timeit("SA stage (1024->512, 32->64) full",
           jax.jit(lambda p, x: sa.apply(variables, p, x, training=False)),
           pos, f)

    # pieces
    @jax.jit
    def piece_sample(p):
        idx = furthest_point_sample(p, N // 2)
        return index_points(p, idx)

    timeit("  fps+gather", piece_sample, pos)
    new_pos = piece_sample(pos)

    @jax.jit
    def piece_bq(p, np_):
        return ball_query(0.15, 32, p, np_)

    timeit("  ball_query", piece_bq, pos, new_pos)
    idx = piece_bq(pos, new_pos)

    @jax.jit
    def piece_group(p, np_, x, i):
        dp = index_points(p, i) - np_[:, :, None, :]
        fj = index_points(x, i)
        return get_aggregation_features(np_, dp / 0.15, None, fj, "dp_fj")

    timeit("  group+aggr", piece_group, pos, new_pos, f, idx)
    fj = piece_group(pos, new_pos, f, idx)

    w1 = jnp.asarray(rng.standard_normal((35, 32)), jnp.float32) * 0.1
    w2 = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32) * 0.1

    @jax.jit
    def piece_mlp(fj):
        h = jnp.maximum(jnp.dot(fj, w1, preferred_element_type=jnp.float32), 0)
        h = jnp.dot(h, w2, preferred_element_type=jnp.float32)
        return jnp.max(h, axis=2)

    timeit("  mlp(35->32->64)+pool", piece_mlp, fj)

    # suspicion: HIGHEST-precision einsum in square_distance
    from adaptpoint_tpu.ops.geometry import square_distance

    @jax.jit
    def piece_sqdist(a, b):
        return square_distance(b, a)

    timeit("  square_distance (HIGHEST)", piece_sqdist, pos, new_pos)

    @jax.jit
    def piece_sqdist_default(a, b):
        cross = jnp.einsum("bnc,bmc->bnm", b, a)
        return cross

    timeit("  square_distance (default)", piece_sqdist_default, pos, new_pos)

    @jax.jit
    def piece_topk(a, b):
        d2 = square_distance(b, a)
        key = jnp.where(d2 < 0.15 ** 2,
                        jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2),
                        jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2) + N)
        return jax.lax.top_k(-key, 32)

    timeit("  dist+mask+top_k", piece_topk, pos, new_pos)


if __name__ == "__main__":
    main()
