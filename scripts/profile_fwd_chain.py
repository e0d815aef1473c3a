"""Honest (chained, slope-based) per-variant timing of the PointNeXt-S
eval forward at the bench shape. Run alone."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def slope(name, step, x0, lo=5, hi=20):
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
    print(f"  {name:42s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, "cfgs/scanobjectnn/pointnext-s.yaml"),
             recursive=True)
    cfg.model.in_channels = 4
    model = build_model_from_cfg(cfg.model)
    B, N = 128, 1024
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    x0 = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = jax.jit(model.init, static_argnames=("training",))(
        jax.random.PRNGKey(0), pos, x0, training=False)

    @jax.jit
    def full(p):
        f = jnp.concatenate([p, jnp.abs(p[..., 1:2])], axis=-1)
        logits = model.apply(variables, p, f, training=False)
        return p + 1e-30 * jnp.sum(logits)

    slope("full eval fwd (pallas)", full, pos)

    os.environ["ADAPTPOINT_TPU_KERNELS"] = "xla"

    @jax.jit
    def full_xla(p):
        f = jnp.concatenate([p, jnp.abs(p[..., 1:2])], axis=-1)
        logits = model.apply(variables, p, f, training=False)
        return p + 1e-30 * jnp.sum(logits)

    slope("full eval fwd (xla ops)", full_xla, pos)
    os.environ["ADAPTPOINT_TPU_KERNELS"] = "auto"

    # encoder-only and per-op shares
    from adaptpoint_tpu.ops import furthest_point_sample, ball_group

    @jax.jit
    def fps_only(p):
        idx = furthest_point_sample(p, 256)
        return p + 1e-30 * jnp.sum(idx.astype(jnp.float32))

    slope("fps 1024->256", fps_only, pos)

    feats = jnp.asarray(rng.standard_normal((B, N, 64)), jnp.float32)

    @jax.jit
    def bg_only(p):
        idx = furthest_point_sample(p, 512)
        _, fi, dpfj, _ = ball_group(0.15, 32, p, idx, feats, True, True)
        return p + 1e-30 * (jnp.sum(dpfj) + jnp.sum(fi))

    slope("fps+ballgroup stage1 (512, k=32, C=64)", bg_only, pos)

    # pure matmul headroom reference: same FLOPs class as the conv stack
    w = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)

    @jax.jit
    def mm(p):
        h = jnp.reshape(p, (B * N // 64, 192))
        h = h @ jnp.asarray(rng.standard_normal((192, 256)), jnp.float32)
        for _ in range(4):
            h = h @ w
        return p + 1e-30 * jnp.sum(h)

    slope("matmul ladder (reference)", mm, pos)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
