from .build import ADAPTMODELS, build_adaptpointmodels_from_cfg
from . import augmentor, discriminator  # noqa: F401  (register models)
from .pointwolf import PointWOLF, pointwolf
from .feedback import feedback_loss, update_hardratio
from .form_dataset import (FormDatasetCls, FormDatasetShapeNet,
                           Form_dataset_cls, Form_dataset_shapenet)
from .common import (pointwolf_transform, kernel_regression, normalize_cloud,
                     random_axis)
from .augmentor import gumbel_softmax
