"""One-command reference-checkpoint parity driver (VERDICT r4 #5).

Given a trained reference (torch OpenPoints/AdaptPoint) ``.pth`` and its
cfg, this converts the checkpoint, runs ``mode=test`` through the normal
engine, and prints the OA/mAcc next to the reference model zoo's published
number (/root/reference/docs/modelzoo.md:11-19, script/test_all_in_one.sh)
with the delta — the one command to run the day real checkpoints/data are
provisioned:

    python scripts/replay_reference.py \
        --pth scanobjectnn-train-pointnext-s_ckpt_best.pth \
        --cfg cfgs/scanobjectnn/pointnext-s.yaml \
        [dataset.common.data_dir=...] [--corruptions] [--expected-oa 88.20]

k=v trailing overrides are forwarded to the cfg exactly like the training
CLIs. ``--corruptions`` additionally sweeps ScanObjectNN-C / ModelNet-C
(writing outcorruption.txt into the run dir). Exits non-zero if
``--max-delta`` is given and |OA - expected| exceeds it.
"""
import argparse
import json
import logging
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Published OA/mAcc ("our released" column, reference docs/modelzoo.md:11-19)
# keyed by cfg basename. Extend as more cfgs gain published rows.
MODELZOO_SCANOBJECTNN = {
    "pointnet": (75.2, 71.4),
    "dgcnn": (86.1, 84.3),
    "pointmlp": (87.7, 86.4),
    "pointnet++": (86.2, 84.4),
    "pointnext-s": (88.20, 86.84),
}


def parse():
    ap = argparse.ArgumentParser("reference .pth -> convert -> test -> delta")
    ap.add_argument("--pth", required=True, help="reference torch checkpoint")
    ap.add_argument("--cfg", required=True, help="matching cfg yaml")
    ap.add_argument("--out", default=None,
                    help="where to keep the converted .msgpack "
                         "(default: a temp file)")
    ap.add_argument("--expected-oa", type=float, default=None,
                    help="override the model-zoo expected OA")
    ap.add_argument("--max-delta", type=float, default=None,
                    help="fail (exit 1) if |OA - expected| > this")
    ap.add_argument("--corruptions", action="store_true",
                    help="also sweep ScanObjectNN-C / ModelNet-C")
    ap.add_argument("--sd-key", default=None)
    args, opts = ap.parse_known_args()
    return args, opts


def main():
    args, opts = parse()

    out = args.out
    if out is None:
        fd, out = tempfile.mkstemp(suffix=".msgpack")
        os.close(fd)

    # 1. convert through the normal converter CLI machinery
    from convert_torch_ckpt import main as convert_main
    conv_argv = ["--src", args.pth, "--cfg", args.cfg, "--out", out]
    if args.sd_key:
        conv_argv += ["--sd-key", args.sd_key]
    convert_main(conv_argv)

    # 2. mode=test through the classification engine (same path as
    #    examples/classification/main.py)
    from adaptpoint_tpu.utils import EasyConfig, generate_exp_directory, setup_logger
    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.update_opts(opts)
    cfg.mode = "test"
    cfg.pretrained_path = out
    if cfg.get("seed") is None:
        cfg.seed = 0
    cfg.task_name = os.path.basename(os.path.dirname(args.cfg))
    cfg.cfg_basename = os.path.splitext(os.path.basename(args.cfg))[0]
    generate_exp_directory(
        cfg, exp_name=f"replay-{cfg.task_name}-{cfg.cfg_basename}")
    setup_logger(cfg.log_path, 0, name=cfg.task_name)
    logging.info("replay run dir: %s", cfg.run_dir)

    from adaptpoint_tpu.engine.cls_main import main as cls_main
    oa = cls_main(cfg)

    expected = args.expected_oa
    src = "--expected-oa"
    if expected is None:
        row = MODELZOO_SCANOBJECTNN.get(cfg.cfg_basename)
        if row and cfg.task_name == "scanobjectnn":
            expected, src = row[0], "reference docs/modelzoo.md (our released)"
    result = {"cfg": args.cfg, "pth": args.pth, "oa": round(float(oa), 2)}
    if expected is not None:
        result.update(expected_oa=expected, expected_source=src,
                      delta=round(float(oa) - expected, 2))
    print(json.dumps(result))

    # 3. optional corruption sweep on the same restored state — through
    #    the corruption-mode engine's shipped test path
    #    (engine/corrupt_main.py: cfg.test + pretrained_path sweeps and
    #    returns without training)
    if args.corruptions:
        from adaptpoint_tpu.engine.corrupt_main import main as corrupt_main
        sweep_cfg = EasyConfig()
        sweep_cfg.load(args.cfg, recursive=True)
        sweep_cfg.update_opts(opts)
        sweep_cfg.update(dict(
            mode=("modelnetc" if "modelnet" in cfg.task_name
                  else "scanobjectnnc"),
            test=True, pretrained_path=out, epochs=1, run_dir=cfg.run_dir,
            log_path=cfg.log_path, seed=cfg.seed,
            task_name=cfg.task_name, cfg_basename=cfg.cfg_basename))
        if not sweep_cfg.get("datatransforms_scanobjectnn_c"):
            # plain (non-valcorruption) cfgs don't carry the -C transform
            # block; default to the corruption protocol's
            # (pointnext-s_valcorruption.yaml:38-41 — the
            # PointCloudCenterAndNormalize gravity_dim emits the height
            # feature 4-channel models need)
            sweep_cfg.datatransforms_scanobjectnn_c = {
                "val": ["PointsToTensor", "PointCloudCenterAndNormalize"],
                "kwargs": {"gravity_dim": 1}}
        corrupt_main(sweep_cfg)
        logging.info("corruption sweep written to %s/outcorruption.txt",
                     cfg.run_dir)

    if args.max_delta is not None and expected is not None:
        if abs(float(oa) - expected) > args.max_delta:
            print(f"FAIL: |delta| {abs(float(oa) - expected):.2f} > "
                  f"{args.max_delta}", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
