from .build import DATASETS, build_dataset_from_cfg, build_dataloader_from_cfg
from .loader import NumpyLoader
from . import scanobjectnn, synthetic, modelnet, shapenetpart, s3dis, scenes  # noqa: F401
from .scanobjectnn import (eval_corrupt_wrapper, eval_corrupt_wrapper_scanobjectnnc,
                           ScanObjectNNC, CORRUPTIONS)
