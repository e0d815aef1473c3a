"""Logging + experiment-directory helpers.

Parity with the reference (openpoints/utils/logger.py:38-137): colored console
logging on process 0, per-run ``log.txt`` files, and run-dir generation
``log/<task>/<expname-timestamp-uuid>/`` with a ``checkpoint/`` subdir; resume
reuses an existing dir.
"""
from __future__ import annotations

import logging
import os
import sys
import time
import uuid

__all__ = ["setup_logger", "generate_exp_directory", "resume_exp_directory"]


def setup_logger(log_path=None, rank: int = 0, name: str = ""):
    fmt = "%(asctime)s [%(levelname)s] %(message)s"
    handlers = []
    if rank == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(logging.Formatter(fmt))
        handlers.append(sh)
    if log_path is not None:
        suffix = "" if rank == 0 else f".rank{rank}"
        fh = logging.FileHandler(str(log_path) + suffix)
        fh.setFormatter(logging.Formatter(fmt))
        handlers.append(fh)
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)
    for h in handlers:
        root.addHandler(h)
    return root


def generate_exp_directory(cfg, exp_name=None, expid=None, run_name=None):
    """Create ``<root_dir>/<task_name>/<run_name>/{checkpoint}`` and fill cfg paths."""
    if run_name is None:
        expid = expid or (time.strftime("%Y%m%d-%H%M%S") + "-" + uuid.uuid4().hex[:8])
        if isinstance(exp_name, (list, tuple)):
            exp_name = "-".join(exp_name)
        run_name = "-".join([x for x in [exp_name, expid] if x])
    cfg.run_name = run_name
    cfg.run_dir = os.path.join(cfg.get("root_dir", "log"), cfg.get("task_name", ""), run_name)
    cfg.ckpt_dir = os.path.join(cfg.run_dir, "checkpoint")
    cfg.log_path = os.path.join(cfg.run_dir, "log.txt")
    cfg.csv_path = os.path.join(cfg.run_dir, f"{run_name}.csv")
    os.makedirs(cfg.ckpt_dir, exist_ok=True)
    return cfg.run_dir


def resume_exp_directory(cfg, pretrained_path: str):
    """Reuse the run dir that contains ``pretrained_path`` (parity: resume mode)."""
    if os.path.basename(os.path.dirname(pretrained_path)) == "checkpoint":
        cfg.run_dir = os.path.dirname(os.path.dirname(pretrained_path))
    else:
        cfg.run_dir = os.path.dirname(pretrained_path)
    cfg.run_name = os.path.basename(cfg.run_dir)
    cfg.ckpt_dir = os.path.join(cfg.run_dir, "checkpoint")
    cfg.log_path = os.path.join(cfg.run_dir, "log.txt")
    cfg.csv_path = os.path.join(cfg.run_dir, f"{cfg.run_name}.csv")
    os.makedirs(cfg.ckpt_dir, exist_ok=True)
    cfg.wandb = cfg.get("wandb", {})
    return cfg.run_dir


def snapshot_source(cfg, script_path: str = None):
    """Copy the framework package (+ invoking script) into
    ``run_dir/code/`` for reproducibility (parity:
    examples/classification/train_autoaug.py:30-38 copy_codebase)."""
    import shutil
    run_dir = cfg.get("run_dir")
    if not run_dir:
        return
    dst = os.path.join(run_dir, "code")
    if os.path.exists(dst):
        return
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.copytree(pkg, os.path.join(dst, "adaptpoint_tpu"),
                    ignore=shutil.ignore_patterns("__pycache__", "*.so",
                                                  "*.pyc"))
    if script_path and os.path.isfile(script_path):
        shutil.copy2(script_path, dst)
