"""Classification / segmentation metrics.

Parity with the reference (openpoints/utils/metrics.py:33-311): AverageMeter,
ConfusionMatrix with tp/count/overall accuracy in percent, and the ShapeNetPart
instance/class mIoU helpers. The confusion matrix is a plain numpy accumulator
updated from host-side predictions; for multi-chip eval the per-shard tp/count
are summed with ``jax.lax.psum`` equivalents before ``cal_acc`` (see engine).
"""
from __future__ import annotations

import numpy as np

__all__ = ["AverageMeter", "ConfusionMatrix", "get_mious"]


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class ConfusionMatrix:
    """Accumulated confusion matrix. ignore_index must be <0 or >=num_classes."""

    def __init__(self, num_classes: int, ignore_index=None):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.virtual_num_classes = num_classes + 1 if ignore_index is not None else num_classes
        self.value = np.zeros((num_classes, num_classes), dtype=np.int64)

    def reset(self):
        self.value = np.zeros((self.num_classes, self.num_classes), dtype=np.int64)

    def update(self, pred, true):
        pred = np.asarray(pred).reshape(-1).astype(np.int64)
        true = np.asarray(true).reshape(-1).astype(np.int64)
        if self.ignore_index is not None:
            keepers = true != self.ignore_index
            pred = np.where(keepers, pred, self.virtual_num_classes - 1)
            true = np.where(keepers, true, self.virtual_num_classes - 1)
        v = self.virtual_num_classes
        bins = np.bincount(true * v + pred, minlength=v * v).reshape(v, v)
        self.value += bins[: self.num_classes, : self.num_classes]

    @property
    def tp(self):
        return np.diag(self.value)

    @property
    def count(self):
        return self.value.sum(axis=1)

    @property
    def total(self):
        return self.value.sum()

    @property
    def union(self):
        return self.value.sum(axis=0) + self.value.sum(axis=1) - np.diag(self.value)

    @property
    def overall_accuray(self):
        total = max(self.total, 1)
        return self.tp.sum() / total

    def all_acc(self):
        return self.cal_acc(self.tp, self.count)

    @staticmethod
    def cal_acc(tp, count):
        tp = np.asarray(tp, dtype=np.float64)
        count = np.asarray(count, dtype=np.float64)
        acc_per_cls = tp / np.maximum(count, 1) * 100.0
        over_all_acc = tp.sum() / max(count.sum(), 1) * 100.0
        macc = float(acc_per_cls.mean())
        return macc, float(over_all_acc), acc_per_cls

    def all_metrics(self):
        tp = self.tp.astype(np.float64)
        fp = self.value.sum(axis=0) - self.tp
        fn = self.value.sum(axis=1) - self.tp
        iou_per_cls = tp / np.maximum(tp + fp + fn, 1) * 100.0
        acc_per_cls = tp / np.maximum(self.count, 1) * 100.0
        over_all_acc = tp.sum() / max(self.total, 1) * 100.0
        return (float(iou_per_cls.mean()), float(acc_per_cls.mean()), float(over_all_acc),
                iou_per_cls, acc_per_cls)


def get_mious(tp, union, count):
    tp = np.asarray(tp, dtype=np.float64)
    union = np.asarray(union, dtype=np.float64)
    count = np.asarray(count, dtype=np.float64)
    iou_per_cls = (tp + 1e-10) / (union + 1e-10) * 100.0
    acc_per_cls = (tp + 1e-10) / (count + 1e-10) * 100.0
    over_all_acc = tp.sum() / count.sum() * 100.0
    miou = float(iou_per_cls.mean())
    macc = float(acc_per_cls.mean())
    return miou, macc, float(over_all_acc), iou_per_cls, acc_per_cls
