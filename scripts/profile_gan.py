"""Piecewise GAN-step profile on TPU: augmentor fwd/bwd, discriminator,
feedback classifier — find what dominates the 5.5s step. Run alone."""
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
from adaptpoint_tpu.engine.cls_trainer import build_train_tools, init_state
from adaptpoint_tpu.engine.adapt_trainer import build_gan


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {name}: {dt:.1f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo, "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    B, N = 32, 1024
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    generator, discriminator, tx_g, tx_d, gan_state = build_gan(
        cfg, jnp.asarray(batch["x"][:2, :, :3]), key)

    pos = jnp.asarray(batch["x"][..., :3])
    gvars = {"params": gan_state.g_params, "batch_stats": gan_state.g_bs}
    dvars = {"params": gan_state.d_params, "batch_stats": gan_state.d_bs}
    rngs = {"wolf": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)}

    @jax.jit
    def g_fwd(gvars, pos):
        out, _ = generator.apply(gvars, pos, training=True,
                                 mutable=["batch_stats"], rngs=rngs)
        return out[1] if isinstance(out, tuple) else out

    fake = bench("G fwd", g_fwd, gvars, pos)

    @jax.jit
    def g_bwd(params, pos):
        def loss(p):
            out, _ = generator.apply(
                {"params": p, "batch_stats": gan_state.g_bs}, pos,
                training=True, mutable=["batch_stats"], rngs=rngs)
            f = out[1] if isinstance(out, tuple) else out
            return jnp.mean(f ** 2)
        return jax.grad(loss)(params)

    bench("G bwd (L2 loss)", g_bwd, gan_state.g_params, pos)

    @jax.jit
    def d_fwd(dvars, x):
        out, _ = discriminator.apply(dvars, x, training=True,
                                     rngs={"dropout": jax.random.PRNGKey(5)},
                                     mutable=["batch_stats"])
        return out

    bench("D fwd", d_fwd, dvars, fake)

    @jax.jit
    def d_bwd(params, x):
        def loss(p):
            out, _ = discriminator.apply(
                {"params": p, "batch_stats": gan_state.d_bs}, x,
                training=True, rngs={"dropout": jax.random.PRNGKey(5)},
                mutable=["batch_stats"])
            return jnp.mean(out ** 2)
        return jax.grad(loss)(params)

    bench("D bwd", d_bwd, gan_state.d_params, fake)

    cvars = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def cls_fwd(cvars, pos):
        x = jnp.concatenate([pos, pos[..., 2:3]], -1)
        out, _ = model.apply(cvars, pos, x, training=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(3)})
        return out

    bench("CLS fwd (feedback)", cls_fwd, cvars, fake)

    @jax.jit
    def cls_bwd_wrt_input(pos):
        def loss(pos):
            x = jnp.concatenate([pos, pos[..., 2:3]], -1)
            out, _ = model.apply(cvars, pos, x, training=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.mean(out ** 2)
        return jax.grad(loss)(pos)

    bench("CLS bwd wrt input (feedback grad)", cls_bwd_wrt_input, fake)

    @jax.jit
    def full_g_grad(params, pos):
        def loss(p):
            out, _ = generator.apply(
                {"params": p, "batch_stats": gan_state.g_bs}, pos,
                training=True, mutable=["batch_stats"], rngs=rngs)
            f = out[1] if isinstance(out, tuple) else out
            dsc, _ = discriminator.apply(dvars, f, training=True,
                                         rngs={"dropout": jax.random.PRNGKey(5)},
                                         mutable=["batch_stats"])
            x = jnp.concatenate([f, f[..., 2:3]], -1)
            logits, _ = model.apply(cvars, f, x, training=True,
                                    mutable=["batch_stats"],
                                    rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.mean(dsc ** 2) + jnp.mean(logits ** 2)
        return jax.grad(loss)(params)

    bench("G grad through D + CLS (full phase-A shape)", full_g_grad,
          gan_state.g_params, pos)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
