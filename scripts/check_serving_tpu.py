"""On-TPU check of the serving artifact path (docs/serving.md).

Exports the flagship PointNeXt-S eval forward (random-init params — this
checks the compile/serialize/deserialize/execute path, not accuracy) as a
serving artifact on the real chip, reloads it, verifies logits match the
live jitted model, and measures served throughput at the biggest bucket.

Usage: python scripts/check_serving_tpu.py [--batch-sizes 1,32,128]
"""
import argparse
import os
import sys
import tempfile
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

os.environ.setdefault("ADAPTPOINT_TPU_EVAL_DPFJ", "bf16")
os.environ.setdefault("ADAPTPOINT_TPU_EVAL_FUSED", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", default="1,32,128")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]

    import numpy as np
    import jax

    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.serving import (export_serving_artifact,
                                        load_serving_artifact)

    cfg = EasyConfig()
    cfg.load(os.path.join(repo, "cfgs/scanobjectnn/pointnext-s.yaml"),
             recursive=True)
    model = build_model_from_cfg(cfg.model)
    n_pts = int(cfg.num_points)
    in_ch = int(cfg.model.encoder_args.in_channels)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, n_pts, in_ch)).astype(np.float32)
    variables = jax.jit(model.init, static_argnames=("training",))(
        jax.random.PRNGKey(0), x[..., :3], x, training=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    out = args.out or tempfile.mkdtemp(prefix="serving_")
    t0 = time.perf_counter()
    manifest = export_serving_artifact(
        model, variables, out, num_points=n_pts, in_channels=in_ch,
        batch_sizes=batch_sizes, model_name="PointNeXt-S")
    print(f"export: {time.perf_counter() - t0:.1f}s -> {out} "
          f"(platforms {manifest['platforms']}, "
          f"waiver={manifest['tpu_custom_call_waiver']})")

    served = load_serving_artifact(out)
    bmax = served.batch_sizes[-1]
    xb = rng.standard_normal((bmax, n_pts, in_ch)).astype(np.float32)

    t0 = time.perf_counter()
    logits = served.predict(xb)
    print(f"first served call (B={bmax}, incl. load+compile): "
          f"{time.perf_counter() - t0:.1f}s")
    live = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x[..., :3], x, training=False))(
            variables, xb))
    err = float(np.abs(logits - live).max())
    agree = float((logits.argmax(-1) == live.argmax(-1)).mean())
    print(f"parity vs live model: maxerr {err:.3e}, argmax agree {agree:.4f}")

    for _ in range(2):
        served.predict(xb)  # warm
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        served.predict(xb)
    dt = (time.perf_counter() - t0) / reps
    print(f"served throughput: {bmax / dt:.0f} clouds/s "
          f"({dt * 1e3:.1f} ms / B={bmax} request, host round-trip incl.)")
    assert agree == 1.0, "served argmax diverged from the live model"
    print("ok")


if __name__ == "__main__":
    main()
