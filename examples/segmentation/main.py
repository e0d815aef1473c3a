"""Scene-segmentation CLI (S3DIS) — same public interface as the reference:

    python examples/segmentation/main.py --cfg cfgs/s3dis/<x>.yaml [k=v ...]
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from adaptpoint_tpu.utils import (EasyConfig, generate_exp_directory,
                                  resume_exp_directory, setup_logger)


def main():
    parser = argparse.ArgumentParser("scene segmentation (TPU)")
    parser.add_argument("--cfg", type=str, required=True)
    args, opts = parser.parse_known_args()
    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.update_opts(opts)
    if cfg.get("seed") is None:
        import random
        cfg.seed = random.randint(1, 10000)
    cfg.task_name = os.path.basename(os.path.dirname(args.cfg))
    cfg.exp_name = "-".join([cfg.task_name,
                             os.path.splitext(os.path.basename(args.cfg))[0]])
    # resume/test/val reuse the ckpt's run dir (reference main.py:46-48)
    reused_dir = cfg.get("mode") in ("resume", "test", "val") and cfg.get("pretrained_path")
    if reused_dir:
        resume_exp_directory(cfg, cfg.pretrained_path)
    else:
        generate_exp_directory(cfg, exp_name=cfg.exp_name)
    setup_logger(cfg.log_path, 0)
    # never clobber the original training cfg.yaml when reusing a run dir
    cfg_name = f"cfg_{cfg.get('mode', 'resume')}.yaml" if reused_dir else "cfg.yaml"
    cfg.dump(os.path.join(cfg.run_dir, cfg_name))
    logging.info("run dir: %s", cfg.run_dir)
    from adaptpoint_tpu.engine.seg_main import main as run
    run(cfg)


if __name__ == "__main__":
    main()
