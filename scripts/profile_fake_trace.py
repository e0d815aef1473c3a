"""Trace ONLY the CLS fake fwd+input-grad program (bf16 policy) and list
top device ops."""
import os
import sys
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
from adaptpoint_tpu.utils.precision import dtype_override
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.engine.cls_trainer import build_train_tools, init_state

TRACE_DIR = "/tmp/jax_trace_fake"


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fake"
    print("backend:", jax.default_backend(), "tracing:", which, flush=True)
    rng = np.random.default_rng(0)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo,
                          "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    B, N = 32, 2048
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    cvars = {"params": state.params, "batch_stats": state.batch_stats}
    pos = jnp.asarray(batch["x"][..., :3])

    @jax.jit
    def cls_grad(p):
        with dtype_override("bfloat16"):
            def loss(pp):
                x = jnp.concatenate([pp, pp[..., 2:3]], -1)
                return jnp.mean(model.apply(cvars, pp, x,
                                            training=False) ** 2)
            g = jax.grad(loss)(p)
        return p + 1e-6 * g

    @jax.jit
    def cls_fwd(p):
        with dtype_override("bfloat16"):
            x = jnp.concatenate([p, p[..., 2:3]], -1)
            logits = model.apply(cvars, p, x, training=False)
        return p + 1e-30 * jnp.sum(logits)

    fn = cls_grad if which == "fake" else cls_fwd
    x = fn(pos)
    x = fn(x)
    jax.block_until_ready(x)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            x = fn(x)
        jax.block_until_ready(x)

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
    print(f"{'us/iter':>10}  op")
    for name, us in top:
        print(f"{us/4:10.0f}  {name[:110]}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
