"""Config-registry integration check (parity:
examples/classification/testing_main_components.py:34-60): build model +
adaptmodels + criterion + optimizer + scheduler + dataloaders from the real
shipped cfgs."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.adapt import build_adaptpointmodels_from_cfg
from adaptpoint_tpu.loss import build_criterion_from_cfg
from adaptpoint_tpu.scheduler import build_scheduler_from_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_adaptpoint_cfg_builds_all_components():
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO,
                          "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
             recursive=True)
    assert cfg.mode == "adaptpoint"
    assert cfg.epochs == 300 and cfg.criterion_args.label_smoothing == 0.3

    model = build_model_from_cfg(cfg.model)
    gen = build_adaptpointmodels_from_cfg(cfg.adaptmodel_gan)
    dis = build_adaptpointmodels_from_cfg(cfg.adaptmodel_dis)
    criterion = build_criterion_from_cfg(cfg.criterion_args)
    lr_fn = build_scheduler_from_cfg(cfg)
    # cosine t_max=200: epoch 0 at lr, >=200 at min_lr
    assert abs(lr_fn(0) - cfg.lr) < 1e-9
    assert abs(lr_fn(250) - cfg.min_lr) < 1e-9

    logits = jnp.zeros((4, 15))
    y = jnp.zeros((4,), jnp.int32)
    assert float(criterion(logits, y)) > 0

    # every mode cfg loads + dispatches
    for name in ["pointnext-s", "dgcnn", "pointnext-s_valcorruption",
                 "pointnext-s_valcorruption_wpointwolf1",
                 "pointnext-s_valcorruption_wrsmix",
                 "pointnext-s_valcorruption_wwolfmix"]:
        c = EasyConfig()
        c.load(os.path.join(REPO, f"cfgs/scanobjectnn/{name}.yaml"),
               recursive=True)
        build_model_from_cfg(c.model)
