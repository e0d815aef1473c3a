"""Round-3 segment profile of the two-phase step at the bench protocol
(B=32, N=2048), all segments under the SAME bf16 policy the real gan_step
uses. Chained timing per axon rules. Run alone on the TPU."""
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
from adaptpoint_tpu.utils.precision import dtype_override
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.parallel import get_mesh, shard_batch
from adaptpoint_tpu.engine.cls_trainer import build_train_tools, init_state
from adaptpoint_tpu.engine.adapt_trainer import build_gan, make_gan_step


def bench_chain(name, step, x0, iters=6):
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    print(f"  {name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)
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
    B, N = 32, 2048
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

    def full(x):
        st, _, _ = gan_step(x, state, sb, key, jnp.float32(3.0))
        return st
    bench_chain("gan_step full (chained)", jax.jit(full), gan_state)

    # same but feedback off: G+D adversarial only
    import copy
    cfg2 = copy.deepcopy(cfg)
    cfg2.feedbackloss_ratio = 0
    gan_step_nofb = make_gan_step(generator, discriminator, tx_g, tx_d,
                                  model, cfg2)

    def nofb(x):
        st, _, _ = gan_step_nofb(x, state, sb, key, jnp.float32(3.0))
        return st
    bench_chain("gan_step no-feedback (chained)", jax.jit(nofb), gan_state)

    # --- bf16-policy segments ---
    @jax.jit
    def g_fwd(p):
        with dtype_override("bfloat16"):
            out, _ = generator.apply(gvars, p, training=True,
                                     mutable=["batch_stats"], rngs=rngs)
        return out[1]
    bench_chain("G fwd bf16 (chained)", g_fwd, pos)

    @jax.jit
    def g_fb(p):
        with dtype_override("bfloat16"):
            def loss(gp):
                out, _ = generator.apply(
                    {"params": gp, "batch_stats": gan_state.g_bs}, p,
                    training=True, mutable=["batch_stats"], rngs=rngs)
                return jnp.mean(out[1] ** 2)
            g = jax.grad(loss)(gan_state.g_params)
        s = sum(jnp.sum(x) for x in jax.tree.leaves(g))
        return p + 1e-30 * s
    bench_chain("G fwd+bwd bf16 (chained)", g_fb, pos)

    @jax.jit
    def cls_fwd(p):
        with dtype_override("bfloat16"):
            x = jnp.concatenate([p, p[..., 2:3]], -1)
            logits = model.apply(cvars, p, x, training=False)
        return p + 1e-30 * jnp.sum(logits)
    bench_chain("CLS fake fwd bf16 (chained)", cls_fwd, pos)

    @jax.jit
    def cls_grad(p):
        with dtype_override("bfloat16"):
            def loss(pp):
                x = jnp.concatenate([pp, pp[..., 2:3]], -1)
                return jnp.mean(model.apply(cvars, pp, x,
                                            training=False) ** 2)
            g = jax.grad(loss)(p)
        return p + 1e-6 * g
    bench_chain("CLS fake fwd+input-grad bf16 (chained)", cls_grad, pos)

    from adaptpoint_tpu.utils.fastpath import fused_eval

    @jax.jit
    def cls_fused(p):
        with dtype_override("bfloat16"):
            with fused_eval():
                x = jnp.concatenate([p, p[..., 2:3]], -1)
                logits = model.apply(cvars, p, x, training=False)
        return p + 1e-30 * jnp.sum(logits)
    bench_chain("CLS real fused fwd bf16 (chained)", cls_fused, pos)

    @jax.jit
    def d_fb(p):
        with dtype_override("bfloat16"):
            def loss(dp):
                out, _ = discriminator.apply(
                    {"params": dp, "batch_stats": gan_state.d_bs}, p,
                    training=True, rngs={"dropout": jax.random.PRNGKey(5)},
                    mutable=["batch_stats"])
                return jnp.mean(out ** 2)
            g = jax.grad(loss)(gan_state.d_params)
        s = sum(jnp.sum(x) for x in jax.tree.leaves(g))
        return p + 1e-30 * s
    bench_chain("D fwd+bwd bf16 single (chained)", d_fb, pos)

    # --- phase B: classifier train step at the bench protocol (the step
    # itself FPS-resamples 2048->1200->1024 inside) ---
    from adaptpoint_tpu.engine.cls_trainer import make_train_step
    train_step = make_train_step(model, tx, criterion, cfg)

    @jax.jit
    def phase_b(p):
        bb = {"x": jnp.concatenate([p, p[..., 2:3]], -1), "y": sb["y"]}
        _, loss, _ = train_step(state, bb, key, jnp.float32(1e-3))
        return p + 1e-30 * loss
    bench_chain("phase B (fps+train step) (chained)", phase_b, pos)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
