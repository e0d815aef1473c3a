"""Trace ONLY the phase-B classifier train step at the bench protocol and
print HLO-joined per-op device times."""
import glob
import gzip
import json
import os
import re
import sys

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

TRACE_DIR = "/tmp/jax_trace_phaseb"


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
    criterion, tx, _ = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    train_step = make_train_step(model, tx, criterion, cfg)
    fb = shard_batch(mesh, batch)
    lr = jnp.float32(cfg.lr)

    st = state
    for _ in range(2):
        st, loss, _ = train_step(st, fb, key, lr)
    jax.block_until_ready(st)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            st, loss, _ = train_step(st, fb, key, lr)
        jax.block_until_ready(st)

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    agg = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        agg[e.get("name", "?")] = agg.get(e.get("name", "?"), 0.0) \
            + e.get("dur", 0)
    meta = {}
    try:
        txt = jax.jit(lambda *a: train_step(*a)).lower(
            st, fb, key, lr).compile().as_text()
        for mm in re.finditer(
                r"%([\w.\-]+) = [^\n]*?metadata=\{op_name=\"([^\"]*)\"", txt):
            meta[mm.group(1)] = mm.group(2)
    except Exception as e:
        print("hlo map failed:", e)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
    print(f"{'us/iter':>10}  op")
    for name, us in top:
        src = meta.get(name, "").replace("jit(train_step)/", "")
        print(f"{us/4:10.0f}  {name[:50]}  {src[:120]}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
