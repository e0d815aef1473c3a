"""Model registry (parity: openpoints/models/build.py:1-13)."""
from ..utils.registry import Registry, build_from_cfg

MODELS = Registry("models")


def build_model_from_cfg(cfg, **kwargs):
    return build_from_cfg(cfg, MODELS, default_args=kwargs or None)
