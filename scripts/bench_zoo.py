"""Model-zoo inference throughput on TPU vs the reference's published V100 TP.

The reference publishes per-model inference throughput in docs/modelzoo.md
(V100-32GB): ScanObjectNN cls at 128x1024 (modelzoo.md:13-17), S3DIS seg at
16x15000 (modelzoo.md:45,48), ShapeNetPart at 64x2048 (modelzoo.md:54-59).
This script measures the same protocol shapes on the attached TPU chip for
every model family we ship a cfg for, and prints one JSON line per model
with the V100 ratio.

Usage: python scripts/bench_zoo.py [label ...]   (no args = all)
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Same opt-in fast eval modes as the headline bench (argmax-parity tested;
# framework default is f32 / unfused).
os.environ.setdefault("ADAPTPOINT_TPU_EVAL_DPFJ", "bf16")
os.environ.setdefault("ADAPTPOINT_TPU_EVAL_FUSED", "1")

import bench  # noqa: E402  (repo-root bench.py: slope timing + relay probe)

# label -> (cfg, task, B, N, reference V100 TP (ins/sec) or None)
ENTRIES = {
    "pointnet": ("cfgs/scanobjectnn/pointnet.yaml", "cls", 128, 1024, 4212.0),
    "pointnet++": ("cfgs/scanobjectnn/pointnet++.yaml", "cls", 128, 1024,
                   1872.0),
    "dgcnn": ("cfgs/scanobjectnn/dgcnn.yaml", "cls", 128, 1024, 402.0),
    "pointmlp": ("cfgs/scanobjectnn/pointmlp.yaml", "cls", 128, 1024, 191.0),
    "pointnext-s": ("cfgs/scanobjectnn/pointnext-s.yaml", "cls", 128, 1024,
                    2040.0),
    # ShapeNetPart: the reference TP column only lists PointNet++ (560/s,
    # modelzoo.md:57); the PointNeXt rows ship no TP, so vs_ref uses the
    # PointNet++ figure as the table's only anchor, labeled as such.
    "pointnext-s@shapenetpart": ("cfgs/shapenetpart/pointnext-s.yaml",
                                 "partseg", 64, 2048, 560.0),
    "pointnext-s@s3dis": ("cfgs/s3dis/pointnext-s.yaml", "seg", 16, 15000,
                          227.0),
    "pointnext-b@s3dis": ("cfgs/s3dis/pointnext-b.yaml", "seg", 16, 15000,
                          158.0),
    "pointnext-l@s3dis": ("cfgs/s3dis/pointnext-l.yaml", "seg", 16, 15000,
                          115.0),
    "pointnext-xl@s3dis": ("cfgs/s3dis/pointnext-xl.yaml", "seg", 16, 15000,
                           46.0),
    # ModelNet40 zoo row (modelzoo.md:71): PointNeXt-S C=64, 128x1024.
    "pointnext-s@modelnet40": ("cfgs/modelnet40ply2048/pointnext-s.yaml",
                               "cls", 128, 1024, 2033.0),
}


def _build(cfg_path):
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, cfg_path), recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    return build_model_from_cfg(cfg.model), int(
        cfg.model.encoder_args.in_channels)


def _slope_adaptive(step, x0):
    """Slope timing with iteration counts scaled to the model's step time."""
    import jax
    import numpy as np
    y = step(x0)
    np.asarray(jax.tree.leaves(y)[0])  # compile
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(step(x0))[0])
    t1 = max(time.perf_counter() - t0, 1e-4)
    hi = int(min(40, max(6, 2.5 / t1)))
    lo = max(2, hi // 4)
    return bench._slope(step, x0, lo=lo, hi=hi)


def bench_entry(label):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from adaptpoint_tpu.utils.fastpath import fused_eval, fused_eval_env

    cfg_path, task, B, N, ref_tp = ENTRIES[label]
    model, in_ch = _build(cfg_path)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    if task == "cls":
        # ScanObjectNN protocol features: xyz + height (train_autoaug.py
        # feature keys). ModelNet cfgs declare in_channels=3 (xyz only) —
        # match the cfg so the benched model is the protocol model.
        if in_ch >= 4:
            feat_fn = lambda p: jnp.concatenate([p, jnp.abs(p[..., 1:2])], -1)
        else:
            feat_fn = lambda p: p
    else:
        extra = jnp.asarray(rng.standard_normal((B, N, in_ch - 3)),
                            jnp.float32)
        feat_fn = lambda p: jnp.concatenate([p, extra], -1)
    cls0 = jnp.asarray(rng.integers(0, 16, B), jnp.int32)

    key = jax.random.PRNGKey(0)
    if task == "partseg":
        variables = model.init(key, pos, feat_fn(pos), cls0, training=False)
    else:
        variables = model.init(key, pos, feat_fn(pos), training=False)

    @jax.jit
    def forward(p):
        with fused_eval(fused_eval_env()):
            if task == "partseg":
                out = model.apply(variables, p, feat_fn(p), cls0,
                                  training=False)
            else:
                out = model.apply(variables, p, feat_fn(p), training=False)
        return p + 1e-30 * jnp.sum(out)

    t = _slope_adaptive(forward, pos)
    tp = B / t
    rec = {"model": label, "protocol": f"{B}x{N}", "task": task,
           "clouds_per_sec": round(tp, 1),
           "ms_per_batch": round(t * 1e3, 2)}
    if ref_tp:
        rec["ref_v100_tp"] = ref_tp
        rec["vs_v100"] = round(tp / ref_tp, 2)
    if label == "pointnext-s@shapenetpart":
        rec["ref_note"] = "anchor is PointNet++ (the only TP in the table)"
    return rec


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if jax.default_backend() != "cpu":
        bench._wait_for_healthy_device()
    labels = sys.argv[1:] or list(ENTRIES)
    for label in labels:
        try:
            print(json.dumps(bench_entry(label)), flush=True)
        except Exception as e:
            print(json.dumps({"model": label, "error":
                              f"{type(e).__name__}: {e}"[:300]}), flush=True)


if __name__ == "__main__":
    main()
