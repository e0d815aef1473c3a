"""Serving CLI: export an AOT inference artifact from a checkpoint, or run
the HTTP server over one.

    # export (on the platform you will serve on — TPU artifacts serve on TPU)
    python examples/serve.py export --cfg cfgs/scanobjectnn/pointnext-s.yaml \
        pretrained_path=<run>/checkpoint/<name>_ckpt_best.msgpack \
        --out /tmp/pointnext_s_artifact --batch-sizes 1,8,32

    # serve
    python examples/serve.py run --artifact /tmp/pointnext_s_artifact --port 8000

    # query
    curl -s -X POST --data-binary @clouds.npy 'http://localhost:8000/predict'

The artifact is self-contained (params baked into StableHLO): the serving
process never loads model code or the checkpoint. See
adaptpoint_tpu/serving/ for the library API.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_export(args, opts):
    import numpy as np
    import jax

    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.utils.ckpt import load_checkpoint
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.serving import export_serving_artifact

    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.update_opts(opts)
    model = build_model_from_cfg(cfg.model)
    num_points = int(cfg.num_points)
    in_channels = int(cfg.model.get("in_channels", None)
                      or cfg.model.encoder_args.in_channels)

    rng = np.random.default_rng(0)
    pos = rng.standard_normal((1, num_points, 3)).astype(np.float32)
    x = rng.standard_normal((1, num_points, in_channels)).astype(np.float32)
    variables = jax.jit(model.init, static_argnames=("training",))(
        jax.random.PRNGKey(0), pos, x, training=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    path = cfg.get("pretrained_path") or args.pretrained
    if not path:
        raise SystemExit("need pretrained_path=<ckpt.msgpack> (or --pretrained)")
    merged, epoch, best_val = load_checkpoint(dict(variables), path)
    variables = {"params": merged["params"],
                 "batch_stats": merged["batch_stats"]}

    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]
    manifest = export_serving_artifact(
        model, variables, args.out, num_points=num_points,
        in_channels=in_channels, batch_sizes=batch_sizes,
        model_name=str(cfg.model.get("NAME", "")),
        extra_manifest={"cfg": os.path.abspath(args.cfg),
                        "checkpoint": os.path.abspath(path),
                        "checkpoint_epoch": epoch,
                        "checkpoint_best_val": float(best_val or 0.0)})
    print(f"exported {manifest['model_name']} -> {args.out} "
          f"(buckets {manifest['batch_sizes']}, "
          f"platforms {manifest['platforms']})")


def cmd_run(args, _opts):
    from adaptpoint_tpu.serving.server import serve_forever
    serve_forever(args.artifact, host=args.host, port=args.port)


def main():
    ap = argparse.ArgumentParser("adaptpoint-tpu serving")
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("export", help="checkpoint -> AOT artifact")
    ex.add_argument("--cfg", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--pretrained", default="")
    ex.add_argument("--batch-sizes", default="1,8,32")
    run = sub.add_parser("run", help="HTTP server over an artifact")
    run.add_argument("--artifact", required=True)
    run.add_argument("--host", default="0.0.0.0")
    run.add_argument("--port", type=int, default=8000)
    args, opts = ap.parse_known_args()
    if args.cmd == "export":
        cmd_export(args, opts)
    else:
        cmd_run(args, opts)


if __name__ == "__main__":
    main()
