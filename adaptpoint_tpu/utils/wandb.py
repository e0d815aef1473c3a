"""Optional Weights & Biases wrapper (parity: openpoints/utils/wandb.py:30-80).

wandb is not a baked-in dependency: every call degrades to a no-op with a log
message when the package is unavailable or cfg.wandb.use_wandb is false.
"""
from __future__ import annotations

import logging

__all__ = ["Wandb"]


class Wandb:
    IS_ACTIVE = False
    run = None

    @classmethod
    def launch(cls, cfg, use_wandb: bool = False):
        if not use_wandb:
            return
        try:
            import wandb
        except ImportError:
            logging.warning("wandb requested but not installed; disabled")
            return
        wcfg = dict(cfg.get("wandb", {}))
        cls.run = wandb.init(project=wcfg.get("project", "adaptpoint-tpu"),
                             name=cfg.get("run_name"),
                             config=cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg))
        cls.IS_ACTIVE = True

    @classmethod
    def log(cls, data: dict, step=None):
        if cls.IS_ACTIVE and cls.run is not None:
            cls.run.log(data, step=step)

    @classmethod
    def add_file(cls, path: str):
        if cls.IS_ACTIVE:
            import wandb
            wandb.save(path)

    @classmethod
    def get_url(cls):
        return cls.run.get_url() if cls.run is not None else "-"
