"""In-memory fake-cloud datasets built from per-epoch generator outputs.

Parity: openpoints/function_adaptpoint/form_dataset.py:17-69
(Form_dataset_cls / Form_dataset_shapenet). Samples are served unchanged —
no transform, no shuffle inside __getitem__ — matching the reference.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["FormDatasetCls", "FormDatasetShapeNet",
           "Form_dataset_cls", "Form_dataset_shapenet"]


class FormDatasetCls:
    def __init__(self, pointcloud: Sequence[np.ndarray],
                 label: Sequence[np.ndarray],
                 x: Optional[Sequence[np.ndarray]] = None):
        self.pointcloud = np.concatenate(pointcloud)
        self.label = np.concatenate(label)
        self.x = np.concatenate(x) if x is not None else None
        assert self.pointcloud.shape[0] == self.label.shape[0]

    def __len__(self):
        return self.pointcloud.shape[0]

    def get(self, idx: int, rng=None):
        data = {"pos": self.pointcloud[idx], "y": np.int64(self.label[idx])}
        if self.x is not None:
            data["x"] = self.x[idx]
        return data


class FormDatasetShapeNet:
    def __init__(self, pos, y, heights, cls):
        self.pos = np.concatenate(pos)
        self.y = np.concatenate(y)
        self.heights = np.concatenate(heights)
        self.cls = np.concatenate(cls)
        assert self.pos.shape[0] == self.y.shape[0]

    def __len__(self):
        return self.pos.shape[0]

    def get(self, idx: int, rng=None):
        return {"pos": self.pos[idx], "y": self.y[idx],
                "heights": self.heights[idx], "cls": self.cls[idx]}


# reference-name aliases
Form_dataset_cls = FormDatasetCls
Form_dataset_shapenet = FormDatasetShapeNet
