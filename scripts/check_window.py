"""Windowed vs full ball-group maxpool on the real TPU: goldens + timing.

Runs the four AdaptPoint controller grouper shapes (augmentor.py: radii
[.1,.2,.4,.8], K=24, N 2048->256, C 128->1024) on normalized synthetic
clouds. For each: exact fwd golden (splits=3 vs the XLA composite), then
chained slope timings of fwd and fwd+bwd for the full kernel vs the
windowed kernel (both at the controller's splits=1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.ops import _ball_group_max_xla
from adaptpoint_tpu.ops.pallas.ballgroup import ball_group_maxpool_pallas
from adaptpoint_tpu.ops.pallas.window import (ball_group_maxpool_windowed,
                                              pick_window, window_prep)

B = 32
K = 24
STAGES = [(2048, 1024, 128, 0.1), (1024, 512, 256, 0.2),
          (512, 256, 512, 0.4), (256, 128, 1024, 0.8)]


def _cloud(rng, b, n):
    pc = rng.standard_normal((b, n, 3)).astype(np.float32)
    pc -= pc.mean(1, keepdims=True)
    pc /= np.linalg.norm(pc, axis=2, keepdims=True).max(1, keepdims=True)
    return jnp.asarray(pc)


def _slope(fn, x0, lo=5, hi=20):
    y = fn(x0)
    np.asarray(jax.tree.leaves(y)[0])

    def run(k):
        z = x0
        t0 = time.perf_counter()
        for _ in range(k):
            z = fn(z)
        np.asarray(jax.tree.leaves(z)[0])
        return time.perf_counter() - t0

    run(3)
    return (run(hi) - run(lo)) / (hi - lo)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for (N, M, C, R) in STAGES:
        xyz = _cloud(rng, B, N)
        feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        qidx = jnp.stack([jnp.asarray(rng.choice(N, M, replace=False))
                          for _ in range(B)]).astype(jnp.int32)
        tm = 256 if M % 256 == 0 else 128
        w = pick_window(N, R, M, tm)
        ok = bool(jax.jit(
            lambda a, b: window_prep(a, b, R, tm, w)["ok"])(xyz, qidx))
        print(f"N={N} M={M} C={C} r={R}: window={w} ({w/N:.0%} of N) ok={ok}",
              flush=True)

        ref = jax.jit(lambda a, b, c: _ball_group_max_xla(R, K, a, b, c))(
            xyz, qidx, feats)
        got = jax.jit(lambda a, b, c: ball_group_maxpool_windowed(
            R, K, a, b, c, 3, 3, tm))(xyz, qidx, feats)
        for name, r, g in zip(("new_xyz", "fi", "fmax", "fmin"), ref, got):
            a, bb = np.asarray(r), np.asarray(g)
            exact = np.array_equal(a, bb)
            print(f"  golden {name}: {'EXACT' if exact else 'MISMATCH '}"
                  + ("" if exact else f"maxerr={np.abs(a-bb).max():.2e}"),
                  flush=True)

        def fwd_full(x):
            o = ball_group_maxpool_pallas(R, K, x, qidx, feats, 1, 1)
            return x + 1e-30 * o[2].sum()

        def fwd_win(x):
            o = ball_group_maxpool_windowed(R, K, x, qidx, feats, 1, 1, tm)
            return x + 1e-30 * o[2].sum()

        def make_fb(op, *extra):
            def loss(x, f):
                o = op(R, K, x, qidx, f, 1, 1, *extra)
                return (jnp.sum(o[0] ** 2) + jnp.sum(o[1]) + jnp.sum(o[2])
                        + jnp.sum(o[3]))
            g = jax.grad(loss, argnums=(0, 1))

            def step(x):
                gx, gf = g(x, feats)
                return x + 1e-30 * gx
            return step

        t_ff = _slope(jax.jit(fwd_full), xyz)
        t_fw = _slope(jax.jit(fwd_win), xyz)
        t_bf = _slope(jax.jit(make_fb(ball_group_maxpool_pallas)), xyz)
        t_bw = _slope(jax.jit(make_fb(ball_group_maxpool_windowed, tm)), xyz)
        print(f"  fwd:     full {t_ff*1e3:7.2f} ms  win {t_fw*1e3:7.2f} ms "
              f"({t_ff/max(t_fw,1e-9):.2f}x)", flush=True)
        print(f"  fwd+bwd: full {t_bf*1e3:7.2f} ms  win {t_bw*1e3:7.2f} ms "
              f"({t_bf/max(t_bw,1e-9):.2f}x)", flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
