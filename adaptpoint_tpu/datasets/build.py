"""Dataset registry + dataloader factory.

Parity: openpoints/dataset/build.py:10-98 — ``DATASETS`` registry,
``build_dataset_from_cfg``, and ``build_dataloader_from_cfg`` which merges the
split cfg into ``common``, builds the split transform, and returns a loader;
accepts a pre-built ``dataset=`` override (used for the per-epoch fake-cloud
buffer in AdaptPoint training, reference build.py:50-52,71).
"""
from __future__ import annotations

import copy
from typing import Optional

from ..utils.registry import Registry, build_from_cfg
from ..transforms import build_transforms_from_cfg
from .loader import NumpyLoader

DATASETS = Registry("datasets")


def build_dataset_from_cfg(common_cfg, split_cfg=None):
    cfg = copy.deepcopy(dict(common_cfg))
    if split_cfg:
        cfg.update(dict(split_cfg))
    return build_from_cfg(cfg, DATASETS)


def build_dataloader_from_cfg(batch_size: int,
                              dataset_cfg=None,
                              dataloader_cfg=None,
                              datatransforms_cfg=None,
                              split: str = "train",
                              distributed: bool = False,
                              dataset=None,
                              seed: int = 0):
    if dataset is None:
        if datatransforms_cfg is not None:
            # vote transforms only apply when explicitly requested (build.py:60-66)
            trans_split = "train" if split == "train" else "val"
            transform = build_transforms_from_cfg(trans_split, datatransforms_cfg)
        else:
            transform = None
        split_cfg = dict(dataset_cfg.get(split, {}))
        if split_cfg.get("split") is None:
            split_cfg["split"] = split
        split_cfg["transform"] = transform
        dataset = build_dataset_from_cfg(dataset_cfg["common"], split_cfg)

    shuffle = split == "train"
    return NumpyLoader(dataset, batch_size,
                       shuffle=shuffle, drop_last=shuffle, seed=seed,
                       num_workers=(dataloader_cfg or {}).get("num_workers", 0))
