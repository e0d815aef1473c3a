"""bf16 mixed-precision phase B: time + short-horizon training sanity.

Runs 60 classifier train steps at the bench protocol in f32 and in bf16
(same data, same seeds) and compares loss trajectories + prediction
agreement, plus the per-step device time of each (slope timing).
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
from adaptpoint_tpu.engine.cls_trainer import (build_train_tools, init_state,
                                               make_train_step)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo,
                          "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    B, N = 32, 2048
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)

    results = {}
    for prec in ("f32", "bf16"):
        cfg.cls_precision = prec
        model = build_model_from_cfg(cfg.model)
        criterion, tx, _ = build_train_tools(cfg, model)
        state = init_state(cfg, model, tx, key, batch)
        criterion, tx, _ = build_train_tools(cfg, model, state.params)
        state = state.replace(opt_state=tx.init(state.params))
        train_step = make_train_step(model, tx, criterion, cfg)
        fb = {"x": jnp.asarray(batch["x"]), "y": jnp.asarray(batch["y"])}
        lr = jnp.float32(cfg.lr)
        losses = []
        st = state
        for i in range(60):
            st, loss, preds = train_step(st, fb, jax.random.PRNGKey(i), lr)
            if i % 10 == 0 or i == 59:
                losses.append(float(loss))
        acc = float(jnp.mean((preds == fb["y"]).astype(jnp.float32)))
        results[prec] = (losses, acc)
        print(f"{prec}: losses {['%.4f' % l for l in losses]} "
              f"final-batch acc {acc:.3f}", flush=True)

        # slope timing of the step
        @jax.jit
        def chain(s):
            s2, loss, _ = train_step(s, fb, key, lr)
            return s2
        x = chain(st)
        jax.block_until_ready(x)

        def run(k):
            y = st
            t0 = time.perf_counter()
            for _ in range(k):
                y = chain(y)
            jax.block_until_ready(y)
            np.asarray(jax.tree.leaves(y)[0])
            return time.perf_counter() - t0
        run(2)
        t = (run(12) - run(4)) / 8 * 1e3
        print(f"{prec}: step {t:.1f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
