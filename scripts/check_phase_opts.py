"""Round-5 phase-level perf A/B (VERDICT r4 #4): measure, in ONE TPU run,

  a) phase A baseline vs donated GanState (jit donate_argnums),
  b) phase B baseline vs donated TrainState,
  c) phase B f32 vs cls_precision=bf16 (timing only; the accuracy pair is
     scripts/run_seed_pairs_r5.sh bf16),
  d) phase B bf16 + fused train-BN SA (ADAPTPOINT_TPU_TRAIN_FUSED) — the
     round-4 fused kernel lost at f32 (22.2 vs 20.3 ms); under a bf16
     policy the HBM-traffic balance it trades on is different.

Donation benching note: a donated buffer is invalidated, so every timed
run chains from a FRESH deep copy of the initial state.
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
from adaptpoint_tpu.parallel import get_mesh, shard_batch
from adaptpoint_tpu.engine.cls_trainer import (build_train_tools, init_state,
                                               make_train_step)
from adaptpoint_tpu.engine.adapt_trainer import build_gan, make_gan_step


def _copy(tree):
    return jax.tree.map(lambda x: jnp.array(x), tree)


def _slope(step, x0, lo=3, hi=12, fresh=False):
    x = step(_copy(x0) if fresh else x0)
    np.asarray(jax.tree.leaves(x)[0])

    def run(k):
        y = _copy(x0) if fresh else x0
        t0 = time.perf_counter()
        for _ in range(k):
            y = step(y)
        np.asarray(jax.tree.leaves(y)[0])
        return time.perf_counter() - t0

    run(2)
    return (run(hi) - run(lo)) / (hi - lo)


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo,
                          "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    mesh = get_mesh()
    B, N = 32, 2048
    rng = np.random.default_rng(0)
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    criterion, tx, _ = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    gen_m, dis_m, tx_g, tx_d, gan_state = build_gan(
        cfg, jnp.asarray(batch["x"][:2, :, :3]), key)
    gan_step = make_gan_step(gen_m, dis_m, tx_g, tx_d, model, cfg)
    sb = shard_batch(mesh, batch)
    hr = jnp.float32(3.0)
    lr = jnp.float32(cfg.lr)

    # ---- phase A: plain vs donated
    @jax.jit
    def pa(gs):
        gs2, _, _ = gan_step(gs, state, sb, key, hr)
        return gs2

    @jax.jit
    def pa_keep(gs):  # identical body; separate cache entry for donation
        gs2, _, _ = gan_step(gs, state, sb, key, hr)
        return gs2

    pa_don = jax.jit(lambda gs: pa_keep(gs), donate_argnums=0)

    t = _slope(pa, gan_state)
    print(f"phase_a plain   : {t * 1e3:7.2f} ms", flush=True)
    t = _slope(pa_don, gan_state, fresh=True)
    print(f"phase_a donated : {t * 1e3:7.2f} ms", flush=True)

    # ---- phase B variants
    _, gen, _ = gan_step(gan_state, state, sb, key, hr)
    fake = np.asarray(jnp.concatenate([gen, jnp.abs(gen[..., 1:2])], -1))
    fb = shard_batch(mesh, {"x": fake, "y": batch["y"]})

    def make_pb(prec, donate):
        c2 = EasyConfig()
        c2.load(os.path.join(
            repo, "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
            recursive=True)
        c2.model.in_channels = c2.model.encoder_args.in_channels
        c2.cls_precision = prec
        ts = make_train_step(model, tx, criterion, c2)

        def body(st):
            st2, _, _ = ts(st, fb, key, lr)
            return st2
        return jax.jit(body, donate_argnums=(0,) if donate else ())

    for label, prec, donate, fused in (
            ("f32 plain   ", "f32", False, False),
            ("f32 donated ", "f32", True, False),
            ("bf16 plain  ", "bf16", False, False),
            ("bf16 donated", "bf16", True, False),
            ("bf16 fused  ", "bf16", False, True)):
        if fused:
            os.environ["ADAPTPOINT_TPU_TRAIN_FUSED"] = "1"
        else:
            os.environ.pop("ADAPTPOINT_TPU_TRAIN_FUSED", None)
        t = _slope(make_pb(prec, donate), state, fresh=donate)
        print(f"phase_b {label}: {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
