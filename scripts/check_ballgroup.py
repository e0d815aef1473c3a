"""On-TPU golden + perf check of the fused ball-group Pallas kernel vs the
XLA composite (ball_query top_k + take_along_axis gathers)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Golden mode: the training DEFAULT is bwd_splits=2 (~19 mantissa bits on the
# gradient scatter); pin the bit-faithful 3-split mode for the parity check so
# grad maxerr below is a true exactness claim, not a rounding comparison.
os.environ.setdefault("ADAPTPOINT_TPU_BWD_SPLITS", "3")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.ops import ball_query, index_points
from adaptpoint_tpu.ops.pallas.fps import furthest_point_sample_pallas
from adaptpoint_tpu.ops import ball_group as ball_group_pallas

R, K = 0.15, 32


def xla_ref(xyz, qidx, feats):
    new_xyz = index_points(xyz, qidx)
    idx = ball_query(R, K, xyz, new_xyz)
    dp = (index_points(xyz, idx) - new_xyz[:, :, None, :]) / R
    fj = index_points(feats, idx)
    dpfj = jnp.concatenate([dp, fj], -1)
    # match the pallas K-leading layout (B,K,M,*)
    return new_xyz, dpfj.transpose(0, 2, 1, 3), idx


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    for (B, N, M, C) in [(4, 128, 64, 32), (128, 1024, 512, 32),
                         (128, 256, 128, 128), (32, 2048, 1024, 64),
                         (128, 128, 64, 256)]:
        xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        qidx = furthest_point_sample_pallas(xyz, M)

        ref = jax.jit(xla_ref)(xyz, qidx, feats)
        got = jax.jit(lambda a, b, c: ball_group_pallas(R, K, a, b, c,
                                                        True, True))(
            xyz, qidx, feats)
        fi_ref = index_points(feats, qidx)
        fi_err = np.max(np.abs(np.asarray(fi_ref) - np.asarray(got[1])))
        print(f"  fi: maxerr={fi_err:.2e}")
        got = (got[0],) + got[2:]
        names = ["new_xyz", "dpfj", "idx"]
        print(f"B={B} N={N} M={M} C={C}:", flush=True)
        for nm, r, g in zip(names, ref, got):
            r, g = np.asarray(r), np.asarray(g)
            if nm == "idx":
                ok = (r == g).all()
                print(f"  {nm}: exact={ok}")
            else:
                err = np.max(np.abs(r - g))
                print(f"  {nm}: maxerr={err:.2e}")

        # bwd exactness vs XLA autodiff
        def loss_xla(x, f):
            nx, dpfj, _ = xla_ref(x, qidx, f)
            dp, fj = dpfj[..., :3], dpfj[..., 3:]
            fi = index_points(f, qidx)
            return (jnp.sum(nx ** 2) + jnp.sum(dp * dp) +
                    jnp.sum(jnp.sin(fj)) + jnp.sum(fi * 0.5))

        def loss_pl(x, f):
            nx, fi, dpfj, _ = ball_group_pallas(R, K, x, qidx, f, True, True)
            dp, fj = dpfj[..., :3], dpfj[..., 3:]
            return (jnp.sum(nx ** 2) + jnp.sum(dp * dp) +
                    jnp.sum(jnp.sin(fj)) + jnp.sum(fi * 0.5))

        gx1, gf1 = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(xyz, feats)
        gx2, gf2 = jax.jit(jax.grad(loss_pl, argnums=(0, 1)))(xyz, feats)
        print(f"  grad_xyz maxerr={np.max(np.abs(np.asarray(gx1-gx2))):.2e} "
              f"grad_feat maxerr={np.max(np.abs(np.asarray(gf1-gf2))):.2e}",
              flush=True)

        timeit("  xla composite", jax.jit(xla_ref), xyz, qidx, feats)
        timeit("  pallas fused",
               jax.jit(lambda a, b, c: ball_group_pallas(R, K, a, b, c,
                                                         True, True)),
               xyz, qidx, feats)
        timeit("  xla bwd", jax.jit(jax.grad(loss_xla, argnums=(0, 1))),
               xyz, feats)
        timeit("  pallas bwd", jax.jit(jax.grad(loss_pl, argnums=(0, 1))),
               xyz, feats)


if __name__ == "__main__":
    main()
