"""Classification CLI — same public interface as the reference:

    python examples/classification/main.py --cfg cfgs/scanobjectnn/<x>.yaml [k=v ...]

Parity: examples/classification/main.py:14-82 (recursive cfg load, k=v
overrides, task/exp naming from the cfg path, run-dir generation, cfg dump,
mode dispatch). The mp.spawn DDP launch is replaced by a single process
driving the jax.sharding mesh over all local devices.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from adaptpoint_tpu.utils import (EasyConfig, generate_exp_directory, snapshot_source,
                                  resume_exp_directory, setup_logger)


def parse():
    parser = argparse.ArgumentParser("point-cloud classification (TPU)")
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--profile", action="store_true", default=False)
    args, opts = parser.parse_known_args()
    return args, opts


def main():
    args, opts = parse()
    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.update_opts(opts)

    if cfg.get("seed") is None:
        import random
        cfg.seed = random.randint(1, 10000)

    # exp naming from cfg path (reference main.py:30-51)
    cfg.task_name = os.path.basename(os.path.dirname(args.cfg))
    cfg.cfg_basename = os.path.splitext(os.path.basename(args.cfg))[0]
    tags = [cfg.task_name, cfg.cfg_basename, f"ngpus{len(__import__('jax').devices())}"]
    for opt in opts:
        if "=" in opt and "path" not in opt and "dir" not in opt \
                and "/" not in opt:
            tags.append(opt.replace("=", "_"))
    cfg.exp_name = "-".join(tags)

    # resume/test/val reuse the ckpt's run dir (reference main.py:46-48);
    # resume=True is the adapt-loop resume (mode stays adaptpoint*)
    reused_dir = (cfg.get("mode") in ("resume", "test", "val") or cfg.get("resume")) \
        and cfg.get("pretrained_path")
    if reused_dir:
        resume_exp_directory(cfg, cfg.pretrained_path)
    else:
        generate_exp_directory(cfg, exp_name=cfg.exp_name)
    setup_logger(cfg.log_path, 0, name=cfg.get("task_name", ""))
    # never clobber the original training cfg.yaml when reusing a run dir
    cfg_name = f"cfg_{cfg.get('mode', 'resume')}.yaml" if reused_dir else "cfg.yaml"
    cfg.dump(os.path.join(cfg.run_dir, cfg_name))
    if cfg.get("snapshot_code", False):
        snapshot_source(cfg, os.path.abspath(__file__))
    logging.info("run dir: %s", cfg.run_dir)

    mode = cfg.get("mode", "train")
    if args.profile:
        from adaptpoint_tpu.engine.profiler import profile_model
        profile_model(cfg)
        return
    if mode in ("train", "test", "val", "resume", "finetune"):
        from adaptpoint_tpu.engine.cls_main import main as run
        run(cfg)
    elif mode in ("adaptpoint", "adaptpoint_modelnet"):
        from adaptpoint_tpu.engine.adapt_main import main as run
        run(cfg)
    elif mode in ("scanobjectnnc", "modelnetc"):
        from adaptpoint_tpu.engine.corrupt_main import main as run
        run(cfg)
    elif mode == "pretrain":
        from adaptpoint_tpu.engine.pretrain_main import main as run
        run(cfg)
    else:
        raise ValueError(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
