"""Scalar summary logging (parity: openpoints/utils/utils_summary.py:8-43
Summary + TensorBoard writer; reference logs per-iter GAN scalars and
per-epoch train/val scalars, train_autoaug.py:184-208,421-428).

Writes JSONL always (cheap, dependency-free) and TensorBoard when
torch.utils.tensorboard is importable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

__all__ = ["Summary"]


class Summary:
    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir
        self.train_iter_num = 0
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def create_summary(self):
        return self

    def summary_train_iter_num_update(self):
        self.train_iter_num += 1

    def add_scalar(self, tag: str, value, step: int):
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"t": time.time(), "tag": tag, "value": float(value),
                 "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self):
        if self._jsonl is not None:
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
