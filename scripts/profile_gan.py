"""Per-segment timing of the AdaptPoint phase-A gan_step on TPU.

Times each sub-program in isolation with the chained-slope method so the
155-160 ms step cost is attributed to: G fwd, G fwd+bwd (adversarial path
only), classifier feedback fwd (fake+real), classifier feedback fwd +
input-grad, D update, and the full fused step.
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

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.engine.cls_trainer import build_train_tools, init_state
from adaptpoint_tpu.engine.adapt_trainer import build_gan, make_gan_step
from adaptpoint_tpu.loss import BCELoss, build_criterion_from_cfg
from adaptpoint_tpu.adapt import feedback_loss

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def slope(step, x0, lo=3, hi=9, fetch=None):
    fetch = fetch or (lambda y: np.asarray(jax.tree.leaves(y)[0]))
    y = step(x0)
    fetch(y)

    def run(k):
        y = x0
        t0 = time.perf_counter()
        for _ in range(k):
            y = step(y)
        fetch(y)
        return time.perf_counter() - t0

    run(2)
    return (run(hi) - run(lo)) / (hi - lo)


def main():
    cfg = EasyConfig()
    cfg.load(os.path.join(
        REPO, "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
        recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)

    B, N = 32, 2048
    rng = np.random.default_rng(0)
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    generator, discriminator, tx_g, tx_d, gan_state = build_gan(
        cfg, jnp.asarray(batch["x"][:2, :, :3]), key)
    gan_step = make_gan_step(generator, discriminator, tx_g, tx_d, model, cfg)

    pts = jnp.asarray(batch["x"])
    pos = pts[..., :3]
    label = jnp.asarray(batch["y"])
    hr = jnp.float32(3.0)
    crit = build_criterion_from_cfg(cfg.criterion_args)
    bce = BCELoss()

    g_vars = {"params": gan_state.g_params, "batch_stats": gan_state.g_bs}
    d_vars = {"params": gan_state.d_params, "batch_stats": gan_state.d_bs}
    cls_vars = {"params": state.params, "batch_stats": state.batch_stats}

    # 1. G forward only
    @jax.jit
    def g_fwd(p):
        (_, gen), _ = generator.apply(
            g_vars, p, training=True,
            rngs={"wolf": key, "gumbel": key}, mutable=["batch_stats"])
        return p + 1e-30 * jnp.sum(gen)

    t = slope(g_fwd, pos)
    print(f"G fwd:                 {t*1e3:7.1f} ms")
    @jax.jit
    def g_gen(p):
        (_, gen), _ = generator.apply(
            g_vars, p, training=True,
            rngs={"wolf": key, "gumbel": key}, mutable=["batch_stats"])
        return gen

    gen0 = g_gen(pos)

    # 2. G fwd + bwd, adversarial-only loss (no feedback)
    @jax.jit
    def g_adv(p):
        def loss_fn(gp):
            (_, gen), _ = generator.apply(
                {"params": gp, "batch_stats": gan_state.g_bs}, p,
                training=True, rngs={"wolf": key, "gumbel": key},
                mutable=["batch_stats"])
            d_prob, _ = discriminator.apply(
                d_vars, gen, training=True, rngs={"dropout": key},
                mutable=["batch_stats"])
            return bce(d_prob, jnp.full_like(d_prob, 0.9))
        l, grads = jax.value_and_grad(loss_fn)(gan_state.g_params)
        return p + 1e-30 * (l + jnp.sum(jax.tree.leaves(grads)[0]))

    t = slope(g_adv, pos)
    print(f"G fwd+bwd (adv only):  {t*1e3:7.1f} ms")

    # 3. classifier eval fwd at N=2048 (one pass)
    @jax.jit
    def cls_fwd(p):
        x = jnp.concatenate([p, jnp.abs(p[..., 1:2])], -1)
        logits = model.apply(cls_vars, p, x, training=False)
        return p + 1e-30 * jnp.sum(logits)

    t = slope(cls_fwd, gen0)
    print(f"cls eval fwd (1 pass): {t*1e3:7.1f} ms")

    # 4. classifier feedback: fake fwd + input-grad (+ real fwd const)
    @jax.jit
    def cls_feedback(p):
        def loss_fn(g):
            x = jnp.concatenate([g, jnp.abs(g[..., 1:2])], -1)
            logits = model.apply(cls_vars, g, x, training=False)
            return crit(logits, label)
        lf, gin = jax.value_and_grad(loss_fn)(p)
        x = jnp.concatenate([p, jnp.abs(p[..., 1:2])], -1)
        logits_real = model.apply(cls_vars, jax.lax.stop_gradient(p),
                                  jax.lax.stop_gradient(x), training=False)
        lr_ = crit(logits_real, label)
        return p + 1e-6 * (gin + feedback_loss(lf, lr_, hr))

    t = slope(cls_feedback, gen0)
    print(f"cls feedback f+b+real: {t*1e3:7.1f} ms")

    # 5. D update alone (fwd+bwd on real and fake)
    @jax.jit
    def d_step(p):
        def loss_fn(dp):
            rp, up1 = discriminator.apply(
                {"params": dp, "batch_stats": gan_state.d_bs}, p,
                training=True, rngs={"dropout": key}, mutable=["batch_stats"])
            fp, _ = discriminator.apply(
                {"params": dp, "batch_stats": up1["batch_stats"]}, gen0,
                training=True, rngs={"dropout": key}, mutable=["batch_stats"])
            return (bce(rp, jnp.full_like(rp, 0.9)) +
                    bce(fp, jnp.full_like(fp, 0.1))) / 2.0
        l, grads = jax.value_and_grad(loss_fn)(gan_state.d_params)
        return p + 1e-30 * (l + jnp.sum(jax.tree.leaves(grads)[0]))

    t = slope(d_step, pos)
    print(f"D fwd+bwd (both):      {t*1e3:7.1f} ms")

    # 6. full gan_step
    @jax.jit
    def full(gs):
        gs2, gen, _ = gan_step(gs, state, {"x": pts, "y": label}, key, hr)
        return gs2

    t = slope(full, gan_state)
    print(f"FULL gan_step:         {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
