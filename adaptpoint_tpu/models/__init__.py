from .build import MODELS, build_model_from_cfg
from .backbone import pointnext, dgcnn  # noqa: F401  (register models)
from .classification import cls_base  # noqa: F401
