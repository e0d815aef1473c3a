from .transforms_factory import DataTransforms, Compose, build_transforms_from_cfg
from . import point_transforms  # noqa: F401  (register transforms)
