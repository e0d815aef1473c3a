"""Stage-by-stage timing of the PointNeXt-S forward on TPU."""
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


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:35s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, "cfgs/scanobjectnn/pointnext-s.yaml"),
             recursive=True)
    cfg.model.in_channels = 4
    model = build_model_from_cfg(cfg.model)
    enc_cfg = dict(cfg.model.encoder_args)
    from adaptpoint_tpu.models.build import MODELS
    enc = MODELS.build(enc_cfg)

    B, N = 128, 1024
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)

    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    enc_vars = enc.init(jax.random.PRNGKey(0), pos, x, training=False,
                        method="forward_cls_feat")

    timeit("full BaseCls fwd",
           jax.jit(lambda p, f: model.apply(variables, p, f, training=False)),
           pos, x)
    timeit("encoder cls_feat only",
           jax.jit(lambda p, f: enc.apply(enc_vars, p, f, training=False,
                                          method="forward_cls_feat")),
           pos, x)
    # per-stage: seg_feat returns all intermediates; time cumulative prefixes
    timeit("encoder seg_feat (all stages)",
           jax.jit(lambda p, f: enc.apply(enc_vars, p, f, training=False,
                                          method="forward_seg_feat")),
           pos, x)

    # training step cost (fwd+bwd+update)
    from adaptpoint_tpu.engine.cls_trainer import (build_train_tools,
                                                   init_state, make_train_step)
    batch = {"x": np.asarray(jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1)),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    criterion, tx, lr_fn = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    criterion, tx, lr_fn = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, criterion, cfg)
    sb = {"x": jnp.asarray(batch["x"]), "y": jnp.asarray(batch["y"])}
    key = jax.random.PRNGKey(1)
    lr = jnp.float32(2e-3)

    def train_call(s, b, k, l):
        s2, loss, preds = step(s, b, k, l)
        return loss

    timeit("train step (fwd+bwd+opt)", lambda: train_call(state, sb, key, lr),
           iters=10)


if __name__ == "__main__":
    main()
