"""Capture a jax.profiler device trace of gan_step + phase B at the bench
protocol, and summarize the top ops from the trace protobuf."""
import os
import sys
import time
import glob
import gzip
import json

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

TRACE_DIR = "/tmp/jax_trace_r3"


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
    train_step = make_train_step(model, tx, criterion, cfg)
    sb = shard_batch(mesh, batch)

    # warm up both programs
    st = gan_state
    for _ in range(3):
        st, gen, _ = gan_step(st, state, sb, key, jnp.float32(3.0))
    bb = {"x": jnp.concatenate([gen, gen[..., 2:3]], -1), "y": sb["y"]}
    cst, loss, _ = train_step(state, bb, key, jnp.float32(1e-3))
    jax.block_until_ready((st, cst))

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            st, gen, _ = gan_step(st, state, sb, key, jnp.float32(3.0))
        bb = {"x": jnp.concatenate([gen, gen[..., 2:3]], -1), "y": sb["y"]}
        cst, loss, _ = train_step(state, bb, key, jnp.float32(1e-3))
        jax.block_until_ready((st, cst))
    print("trace written", flush=True)

    # summarize: find trace.json.gz and aggregate device-op durations
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing "TPU" / "/device:"
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "XLA Op" in n or "device" in n.lower()}
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:70]

    # map HLO op names -> source op_name metadata from the same program
    meta = {}
    try:
        txt = jax.jit(lambda *a: gan_step(*a)).lower(
            gan_state, state, sb, key, jnp.float32(3.0)).compile().as_text()
        import re
        for mm in re.finditer(
                r"%([\w.\-]+) = [^\n]*?metadata=\{op_name=\"([^\"]*)\"", txt):
            meta[mm.group(1)] = mm.group(2)
    except Exception as e:
        print("hlo map failed:", e)

    print(f"{'us total':>12}  op")
    for name, us in top:
        src = meta.get(name, "")
        # strip the jit prefix noise
        src = src.replace("jit(gan_step)/jit(gan_step)/", "")
        print(f"{us:12.0f}  {name[:60]}  {src[:130]}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
