"""resume=True continuation for the corruption-mode and adapt GAN trainers
(reference resume_checkpoint semantics: restore model+opt state, continue at
epoch+1 — train_autoaug_modelnet.py:323-327). The plain cls trainer's
mode=resume is covered by the engine itself; these two trainers gained
resume in round 4 for extending evidence runs in place."""
import logging
import os

import pytest

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.utils.ckpt import load_pytree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_corrupt_mode_resume(tmp_path):
    from adaptpoint_tpu.engine.corrupt_main import main

    def make_cfg():
        cfg = EasyConfig()
        cfg.load(os.path.join(REPO, "cfgs/synthetic/dgcnn-tiny.yaml"),
                 recursive=True)
        cfg.update({"mode": "scanobjectnnc", "epochs": 1, "batch_size": 16,
                    "val_batch_size": 16,
                    "datatransforms_scanobjectnn_c": {
                        "val": ["PointsToTensor",
                                "PointCloudCenterAndNormalize"],
                        "kwargs": {"gravity_dim": 1}}})
        cfg.run_dir = str(tmp_path)
        cfg.run_name = "resume_test"
        cfg.ckpt_dir = str(tmp_path / "checkpoint")
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        return cfg

    best1 = main(make_cfg())
    latest = os.path.join(str(tmp_path / "checkpoint"),
                          "resume_test_ckpt_latest.msgpack")
    assert load_pytree(latest)["epoch"] == 1

    cfg = make_cfg()
    cfg.update({"resume": True, "pretrained_path": latest, "epochs": 2})
    best2 = main(cfg)
    # exactly one more epoch ran and the best-val watermark carried over
    assert load_pytree(latest)["epoch"] == 2
    assert best2 >= best1


@pytest.mark.slow
def test_adapt_mode_resume(tmp_path, caplog):
    from adaptpoint_tpu.engine.adapt_main import main

    def make_cfg():
        cfg = EasyConfig()
        cfg.load(os.path.join(
            REPO, "cfgs/synthetic/pointnext-tiny_adaptpoint.yaml"),
            recursive=True)
        cfg.update_opts(["epochs=1", "batch_size=16", "val_batch_size=16",
                         "dataset.common.size=32",
                         "dataset.common.num_points=96", "num_points=96"])
        cfg.run_dir = str(tmp_path)
        cfg.run_name = "adapt_resume"
        cfg.ckpt_dir = str(tmp_path / "checkpoint")
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        return cfg

    main(make_cfg())
    latest = os.path.join(str(tmp_path / "checkpoint"),
                          "adapt_resume_ckpt_latest.msgpack")
    assert load_pytree(latest)["epoch"] == 1
    assert os.path.exists(os.path.join(str(tmp_path), "model_gan.msgpack"))

    cfg = make_cfg()
    cfg.update({"resume": True, "pretrained_path": latest, "epochs": 2})
    with caplog.at_level(logging.INFO):
        main(cfg)
    assert load_pytree(latest)["epoch"] == 2
    # the GAN pair (G/D params + batch stats) was restored, not re-initialized
    assert any("resumed GAN pair" in r.message for r in caplog.records)
