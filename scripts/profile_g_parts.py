"""Fine-grained timing of AdaptPoint_Augmentor sub-ops at B=32, N=2048."""
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

from adaptpoint_tpu.ops import (ball_group, furthest_point_sample,
                                index_points, knn_point, three_interpolation)
from adaptpoint_tpu.adapt.augmentor import AnchorSelfAttention
from adaptpoint_tpu.adapt.common import pointwolf_transform


def slope(fn, *args, lo=3, hi=9):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])

    def run(k):
        t0 = time.perf_counter()
        for i in range(k):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0])
        return time.perf_counter() - t0

    run(2)
    return (run(hi) - run(lo)) / (hi - lo) * 1e3


def main():
    B = 32
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # stage shapes of SAComponent at N=2048: (N, C_out) per stage
    stages = [(2048, 1024, 24, 0.1, 128),
              (1024, 512, 24, 0.2, 256),
              (512, 256, 24, 0.4, 512),
              (256, 128, 24, 0.8, 1024)]

    tot_fps = tot_bg = 0.0
    for (N, M, K, R, C) in stages:
        xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

        f_fps = jax.jit(lambda x, n=M: furthest_point_sample(x, n))
        t = slope(f_fps, xyz)
        tot_fps += t
        qidx = f_fps(xyz)

        f_bg = jax.jit(lambda x, q, f: ball_group(R, K, x, q, f,
                                                  relative=False))
        t2 = slope(f_bg, xyz, qidx, feats)
        tot_bg += t2
        print(f"stage N={N:5d} M={M:5d} C={C:4d}: fps {t:6.2f} ms  "
              f"ballgroup {t2:6.2f} ms")
    print(f"TOTAL fps {tot_fps:6.2f} ms  ballgroup {tot_bg:6.2f} ms")

    # mask-head attention at (B, 2048, 64)
    x = jnp.asarray(rng.standard_normal((B, 2048, 64)), jnp.float32)
    xyz = jnp.asarray(rng.standard_normal((B, 2048, 3)), jnp.float32)
    attn = AnchorSelfAttention(64, 4)
    av = attn.init(key, x, xyz, False)
    f_attn = jax.jit(lambda x, p: attn.apply(av, x, p, False))
    print(f"mask attention (2048,64): {slope(f_attn, x, xyz):6.2f} ms")

    # FP decode chain: three_interpolation at each level
    tot_fp = 0.0
    for (N2, N1, C2) in [(128, 256, 1024), (256, 512, 512),
                         (512, 1024, 256), (1024, 2048, 128)]:
        xyz1 = jnp.asarray(rng.standard_normal((B, N1, 3)), jnp.float32)
        xyz2 = jnp.asarray(rng.standard_normal((B, N2, 3)), jnp.float32)
        p2 = jnp.asarray(rng.standard_normal((B, N2, C2)), jnp.float32)
        f_fp = jax.jit(three_interpolation)
        t = slope(f_fp, xyz1, xyz2, p2)
        tot_fp += t
    print(f"FP three_interpolation total: {tot_fp:6.2f} ms")

    # pointwolf transform at (B,2048,3), M=4 anchors
    pos = jnp.asarray(rng.standard_normal((B, 2048, 3)), jnp.float32)
    anchors = pos[:, :4]
    probs = jnp.asarray(rng.standard_normal((B, 4, 9)), jnp.float32)
    f_wolf = jax.jit(lambda p, a, pr: pointwolf_transform(
        key, p, a, sigma=0.5, r_range=10., s_range=3., t_range=.25, probs=pr))
    print(f"pointwolf_transform:      {slope(f_wolf, pos, anchors, probs):6.2f} ms")

    # conv stack cost proxy: the pre{i} Dense+BN+ReLU at each stage, f32
    tot_conv = 0.0
    for (N, Cin, Cout) in [(2048, 3, 64), (2048, 64, 128), (1024, 128, 256),
                           (512, 256, 512), (256, 512, 1024)]:
        xx = jnp.asarray(rng.standard_normal((B, N, Cin)), jnp.float32)
        dense = nn.Dense(Cout)
        dv = dense.init(key, xx)
        f_c = jax.jit(lambda x: nn.relu(dense.apply(dv, x)))
        t = slope(f_c, xx)
        tot_conv += t
    print(f"conv stack (f32 proxy):   {tot_conv:6.2f} ms")


if __name__ == "__main__":
    main()
