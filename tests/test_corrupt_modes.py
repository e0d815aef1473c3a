"""scanobjectnnc-mode trainer with pointwolf / rsmix / wolfmix baselines on
the synthetic fixture (corruption sweeps skip gracefully without the -C h5s)."""
import os

import pytest

from adaptpoint_tpu.utils import EasyConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PW = {"w_num_anchor": 4, "w_sigma": 0.5, "w_R_range": 10, "w_S_range": 3,
      "w_T_range": 0.25}
RS = {"is_use": True, "rsmix_prob": 0.5, "beta": 1.0, "nsample": 32,
      "knn": True}


def base_cfg(tmp_path):
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, "cfgs/synthetic/dgcnn-tiny.yaml"),
             recursive=True)
    cfg.update({"mode": "scanobjectnnc", "epochs": 1, "batch_size": 16,
                "val_batch_size": 16,
                "datatransforms_scanobjectnn_c": {
                    "val": ["PointsToTensor", "PointCloudCenterAndNormalize"],
                    "kwargs": {"gravity_dim": 1}}})
    cfg.run_dir = str(tmp_path)
    cfg.run_name = None  # skip ckpt io in this smoke test
    return cfg


@pytest.mark.parametrize("variant", [
    "plain",
    pytest.param("pointwolf", marks=pytest.mark.slow),
    pytest.param("rsmix", marks=pytest.mark.slow),
    pytest.param("wolfmix", marks=pytest.mark.slow)])
def test_scanobjectnnc_mode_variants(tmp_path, variant):
    cfg = base_cfg(tmp_path / variant)
    if variant == "pointwolf":
        cfg.update({"pointwolf": PW})
    elif variant == "rsmix":
        cfg.update({"rsmix_params": RS})
    elif variant == "wolfmix":
        cfg.update({"wolfmix": {"rsmix_params": RS, "pointwolf": PW}})
    from adaptpoint_tpu.engine.corrupt_main import main
    best = main(cfg)
    assert best is not None and best >= 0
