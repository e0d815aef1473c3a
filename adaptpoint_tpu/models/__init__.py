from .build import MODELS, build_model_from_cfg
from . import backbone  # noqa: F401  (register models)
from .classification import cls_base  # noqa: F401
from .segmentation import base_seg  # noqa: F401
from . import reconstruction  # noqa: F401
