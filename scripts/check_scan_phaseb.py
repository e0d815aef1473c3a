"""Compare single train_step vs K-scan per-batch cost on TPU (chained)."""
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
from adaptpoint_tpu.parallel import get_mesh, shard_batch, shard_batch_stack
from adaptpoint_tpu.engine.cls_trainer import (build_train_tools, init_state,
                                               make_train_step,
                                               make_train_step_scan)


def slope(fn, x0, lo=5, hi=25):
    x = fn(x0)
    jax.block_until_ready(x)

    def run(k):
        y = x0
        t0 = time.perf_counter()
        for _ in range(k):
            y = fn(y)
        jax.block_until_ready(y)
        np.asarray(jax.tree.leaves(y)[0])
        return time.perf_counter() - t0

    run(3)
    return (run(hi) - run(lo)) / (hi - lo) * 1e3


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
    B, N, K = 32, 2048, 8
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    criterion, tx, _ = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, criterion, cfg)
    scan = make_train_step_scan(model, tx, criterion, cfg)
    lr = jnp.float32(cfg.lr)
    fb = shard_batch(mesh, batch)
    fbs = shard_batch_stack(
        mesh, [{"x": np.roll(batch["x"], k, axis=0),
                "y": np.roll(batch["y"], k, axis=0)} for k in range(K)])

    @jax.jit
    def one(st):
        st2, loss, _ = step(st, fb, key, lr)
        return st2

    @jax.jit
    def scn(st):
        st2, losses, _ = scan(st, fbs, key, lr)
        return st2

    t1 = slope(one, state)
    tk = slope(scn, state, lo=3, hi=12)
    print(f"single step: {t1:.1f} ms/call")
    print(f"scan K={K}: {tk:.1f} ms/call = {tk/K:.1f} ms/batch", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
