"""Transform registry + composition.

Parity: openpoints/transforms/transforms_factory.py:4-60 (DataTransforms
registry, Compose, build_transforms_from_cfg(split, cfg)). Transforms here are
host-side numpy callables taking (data_dict, np.random.Generator) — JAX has no
global RNG, so the generator is threaded explicitly.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils.registry import Registry

DataTransforms = Registry("datatransforms")


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, data, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        for t in self.transforms:
            data = t(data, rng)
        return data


def build_transforms_from_cfg(split: str, datatransforms_cfg) -> Optional[Compose]:
    if datatransforms_cfg is None:
        return None
    transform_list = datatransforms_cfg.get(split, None)
    transform_args = datatransforms_cfg.get("kwargs", None) or {}
    if not transform_list:
        return None
    transforms = [DataTransforms.build({"NAME": name}, default_args=transform_args)
                  for name in transform_list]
    return Compose(transforms)
