"""Honest GAN-step profile: chain each iteration's input on the previous
output so the axon execution cache cannot short-circuit repeated calls.
Run alone."""
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
from adaptpoint_tpu.parallel import get_mesh, shard_batch
from adaptpoint_tpu.engine.cls_trainer import build_train_tools, init_state
from adaptpoint_tpu.engine.adapt_trainer import build_gan, make_gan_step


def bench_chain(name, step, x0, iters=5):
    """step: x -> x (same pytree structure). Chained, so no result caching."""
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    print(f"  {name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms",
          flush=True)
    return x


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo,
                          "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    mesh = get_mesh()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    print(f"B={B} N={N}", flush=True)
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    generator, discriminator, tx_g, tx_d, gan_state = build_gan(
        cfg, jnp.asarray(batch["x"][:2, :, :3]), key)
    gan_step = make_gan_step(generator, discriminator, tx_g, tx_d, model, cfg)
    sb = shard_batch(mesh, batch)
    pos = jnp.asarray(batch["x"][..., :3])
    gvars = {"params": gan_state.g_params, "batch_stats": gan_state.g_bs}
    cvars = {"params": state.params, "batch_stats": state.batch_stats}
    rngs = {"wolf": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)}

    # --- chained gan_step (the real number) ---
    def full(x):
        st, _, _ = gan_step(x, state, sb, key, jnp.float32(3.0))
        return st
    bench_chain("gan_step (chained)", jax.jit(lambda s: full(s)), gan_state)

    # --- chained G fwd: feed gen back as pos ---
    @jax.jit
    def g_fwd(p):
        out, _ = generator.apply(gvars, p, training=True,
                                 mutable=["batch_stats"], rngs=rngs)
        return out[1]
    bench_chain("G fwd (chained)", g_fwd, pos)

    # --- chained G grad: tiny grad-dependent perturbation of pos ---
    @jax.jit
    def g_grad_step(p):
        def loss(gp):
            out, _ = generator.apply(
                {"params": gp, "batch_stats": gan_state.g_bs}, p,
                training=True, mutable=["batch_stats"], rngs=rngs)
            return jnp.mean(out[1] ** 2)
        g = jax.grad(loss)(gan_state.g_params)
        s = sum(jnp.sum(x) for x in jax.tree.leaves(g))
        return p + 1e-30 * s
    bench_chain("G bwd (chained)", g_grad_step, pos)

    # --- chained classifier fwd (eval mode, as in feedback) ---
    @jax.jit
    def cls_fwd(p):
        x = jnp.concatenate([p, p[..., 2:3]], -1)
        logits = model.apply(cvars, p, x, training=False)
        return p + 1e-30 * jnp.sum(logits)
    bench_chain("CLS fwd eval (chained)", cls_fwd, pos)

    # --- chained classifier input-grad ---
    @jax.jit
    def cls_grad(p):
        def loss(p):
            x = jnp.concatenate([p, p[..., 2:3]], -1)
            return jnp.mean(model.apply(cvars, p, x, training=False) ** 2)
        return p + 1e-6 * jax.grad(loss)(p)
    bench_chain("CLS input-grad eval (chained)", cls_grad, pos)

    # --- chained discriminator fwd+bwd ---
    @jax.jit
    def d_grad(p):
        def loss(dp):
            out, _ = discriminator.apply(
                {"params": dp, "batch_stats": gan_state.d_bs}, p,
                training=True, rngs={"dropout": jax.random.PRNGKey(5)},
                mutable=["batch_stats"])
            return jnp.mean(out ** 2)
        g = jax.grad(loss)(gan_state.d_params)
        s = sum(jnp.sum(x) for x in jax.tree.leaves(g))
        return p + 1e-30 * s
    bench_chain("D fwd+bwd (chained)", d_grad, pos)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
