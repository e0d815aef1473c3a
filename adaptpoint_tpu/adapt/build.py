"""AdaptPoint model registry (parity: openpoints/models_adaptpoint/build.py:6-16)."""
from ..utils.registry import Registry, build_from_cfg

ADAPTMODELS = Registry("adaptmodels")


def build_adaptpointmodels_from_cfg(cfg, **kwargs):
    return build_from_cfg(cfg, ADAPTMODELS, default_args=kwargs or None)
