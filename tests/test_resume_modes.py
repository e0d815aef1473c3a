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


@pytest.mark.slow
def test_partseg_adapt_resume(tmp_path, caplog):
    """Part-seg adapt loop resume (reference train_adapt.py:352-362):
    classifier + GAN pair restored, continues at epoch+1."""
    from adaptpoint_tpu.engine.partseg_main import main
    from test_adapt_variants_e2e import PARTSEG_MODEL

    def make_cfg():
        cfg = EasyConfig()
        cfg.update({
            "model": PARTSEG_MODEL,
            "dataset": {"common": {"NAME": "SyntheticPartSeg",
                                   "num_points": 64, "size": 32},
                        "train": {"split": "train"},
                        "val": {"split": "val"}},
            "dataloader": {"num_workers": 0},
            "datatransforms": {"train": None, "val": None},
            "criterion_args": {"NAME": "SmoothCrossEntropy",
                               "label_smoothing": 0.2},
            "lr": 0.002, "optimizer": {"NAME": "adamw",
                                       "weight_decay": 0.05},
            "sched": "cosine", "epochs": 1, "min_lr": 1e-5, "t_max": 1,
            "warmup_epochs": 0, "grad_norm_clip": 10, "val_freq": 1,
            "batch_size": 8, "val_batch_size": 8, "num_classes": 8,
            "num_points": 64, "seed": 1,
            "mode": "adaptpoint",
            "adaptmodel_gan": {"NAME": "AdaptPoint_Augmentor",
                               "w_num_anchor": 4, "w_sigma": 0.5,
                               "w_R_range": 10, "w_S_range": 3,
                               "w_T_range": 0.25},
            "adaptmodel_dis": {"NAME": "PointDiscriminator1",
                               "num_classes": 8, "normal_channel": False},
            "adaptpoint_params": {"lr_generator": 1e-4,
                                  "lr_discriminator": 4e-4,
                                  "b1": 0.5, "b2": 0.999,
                                  "hardratio_std": 2, "hardratio_s": 3,
                                  "hardratio": 3},
        })
        cfg.run_dir = str(tmp_path)
        cfg.run_name = "part_resume"
        cfg.ckpt_dir = str(tmp_path / "checkpoint")
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        return cfg

    main(make_cfg())
    latest = os.path.join(str(tmp_path / "checkpoint"),
                          "part_resume_ckpt_latest.msgpack")
    assert load_pytree(latest)["epoch"] == 1

    cfg = make_cfg()
    cfg.update({"resume": True, "pretrained_path": latest, "epochs": 2})
    with caplog.at_level(logging.INFO):
        main(cfg)
    assert load_pytree(latest)["epoch"] == 2
    assert any("resumed GAN pair" in r.message for r in caplog.records)


@pytest.mark.slow
def test_seg_mode_resume(tmp_path):
    """Scene-seg trainer mode=resume: state restored, continues at
    epoch+1, best-mIoU watermark carried."""
    from adaptpoint_tpu.engine.seg_main import main

    def make_cfg():
        cfg = EasyConfig()
        cfg.update({
            "model": {
                "NAME": "BaseSeg",
                "encoder_args": {
                    "NAME": "PointNextEncoder", "blocks": [1, 1, 1],
                    "strides": [1, 4, 4], "width": 16, "in_channels": 4,
                    "sa_layers": 1, "sa_use_res": False, "radius": 0.5,
                    "nsample": 8,
                    "group_args": {"NAME": "ballquery",
                                   "normalize_dp": True},
                    "norm_args": {"norm": "bn"},
                    "act_args": {"act": "relu"},
                    "conv_args": {"order": "conv-norm-act"}},
                "decoder_args": {"NAME": "PointNextDecoder"},
                "cls_args": {"NAME": "SegHead", "num_classes": 4,
                             "norm_args": {"norm": "bn"}}},
            "dataset": {"common": {"NAME": "SyntheticScene",
                                   "num_points": 128, "size": 16},
                        "train": {"split": "train"},
                        "val": {"split": "val"}},
            "dataloader": {"num_workers": 0},
            "datatransforms": {"train": None, "val": None},
            "feature_keys": "x,heights",
            "criterion_args": {"NAME": "CrossEntropy"},
            "lr": 0.01, "optimizer": {"NAME": "adamw",
                                      "weight_decay": 1e-4},
            "sched": "cosine", "epochs": 1, "min_lr": 1e-5, "t_max": 1,
            "warmup_epochs": 0, "grad_norm_clip": 10, "val_freq": 1,
            "batch_size": 8, "val_batch_size": 8, "num_classes": 4,
            "seed": 0,
        })
        cfg.run_dir = str(tmp_path)
        cfg.run_name = "seg_resume"
        cfg.ckpt_dir = str(tmp_path / "checkpoint")
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        return cfg

    best1 = main(make_cfg())
    latest = os.path.join(str(tmp_path / "checkpoint"),
                          "seg_resume_ckpt_latest.msgpack")
    assert load_pytree(latest)["epoch"] == 1

    cfg = make_cfg()
    cfg.update({"mode": "resume", "pretrained_path": latest, "epochs": 2})
    best2 = main(cfg)
    assert load_pytree(latest)["epoch"] == 2
    assert best2 >= best1


@pytest.mark.slow
def test_cls_resume_with_converted_opt_moments(tmp_path, caplog):
    """A checkpoint carrying 'opt_moments' (the converter's --optimizer
    output) is spliced into the optax state on mode=resume and training
    continues (mid-training migration wiring, engine/cls_main.py)."""
    import jax
    import numpy as np
    from adaptpoint_tpu.engine.cls_main import main
    from adaptpoint_tpu.utils.ckpt import save_pytree

    def make_cfg():
        cfg = EasyConfig()
        cfg.load(os.path.join(REPO, "cfgs/synthetic/dgcnn-tiny.yaml"),
                 recursive=True)
        cfg.update({"epochs": 1, "batch_size": 16, "val_batch_size": 16})
        cfg.run_dir = str(tmp_path)
        cfg.run_name = "optmig_test"
        cfg.ckpt_dir = str(tmp_path / "checkpoint")
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        return cfg

    main(make_cfg())
    latest = os.path.join(str(tmp_path / "checkpoint"),
                          "optmig_test_ckpt_latest.msgpack")
    payload = load_pytree(latest)
    # simulate a converter-produced checkpoint: moments present, no
    # opt_state (the reference side has no optax tree)
    ones = jax.tree_util.tree_map(
        lambda v: np.full(np.shape(v), 0.01, np.float32), payload["params"])
    converted = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"],
                 "epoch": payload["epoch"],
                 "opt_moments": {"mu": ones, "nu": ones,
                                 "count": np.asarray(37, np.int32)}}
    conv_path = str(tmp_path / "converted.msgpack")
    save_pytree(converted, conv_path)

    cfg = make_cfg()
    cfg.update({"mode": "resume", "pretrained_path": conv_path, "epochs": 2})
    with caplog.at_level(logging.INFO):
        main(cfg)
    assert any("spliced converted optimizer moments" in r.message
               for r in caplog.records)
    assert load_pytree(latest)["epoch"] == 2
