"""Device-trace profile of one model-zoo forward (see scripts/bench_zoo.py).

Usage: python scripts/profile_model.py <label> [iters]
Prints the top device ops with their HLO source op_name, like
scripts/profile_trace.py does for the gan step.
"""
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ADAPTPOINT_TPU_EVAL_DPFJ", "bf16")
os.environ.setdefault("ADAPTPOINT_TPU_EVAL_FUSED", "1")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/jax_trace_model"


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_zoo
    from adaptpoint_tpu.utils.fastpath import fused_eval, fused_eval_env

    label = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cfg_path, task, B, N, _ = bench_zoo.ENTRIES[label]
    model, in_ch = bench_zoo._build(cfg_path)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    if task == "cls":
        feat_fn = lambda p: jnp.concatenate([p, jnp.abs(p[..., 1:2])], -1)
    else:
        extra = jnp.asarray(rng.standard_normal((B, N, in_ch - 3)),
                            jnp.float32)
        feat_fn = lambda p: jnp.concatenate([p, extra], -1)
    cls0 = jnp.asarray(rng.integers(0, 16, B), jnp.int32)
    key = jax.random.PRNGKey(0)
    args = (pos, feat_fn(pos)) + ((cls0,) if task == "partseg" else ())
    variables = model.init(key, *args, training=False)

    @jax.jit
    def forward(p):
        with fused_eval(fused_eval_env()):
            a = (p, feat_fn(p)) + ((cls0,) if task == "partseg" else ())
            out = model.apply(variables, *a, training=False)
        return p + 1e-30 * jnp.sum(out)

    x = forward(pos)
    jax.block_until_ready(x)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(iters):
            x = forward(x)
        jax.block_until_ready(x)
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "XLA Op" in n
                or "device" in n.lower()}
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:50]

    meta = {}
    try:
        txt = forward.lower(pos).compile().as_text()
        for mm in re.finditer(
                r"%([\w.\-]+) = [^\n]*?metadata=\{op_name=\"([^\"]*)\"", txt):
            meta[mm.group(1)] = mm.group(2)
    except Exception as e:
        print("hlo map failed:", e)

    total = sum(agg.values())
    print(f"total device us over {iters} iters: {total:.0f} "
          f"(~{total / iters / 1e3:.2f} ms/iter)")
    print(f"{'us total':>12}  op")
    for name, us in top:
        src = meta.get(name, "").replace("jit(forward)/", "")
        print(f"{us:12.0f}  {name[:55]}  {src[:140]}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
