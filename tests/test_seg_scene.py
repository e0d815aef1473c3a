"""Scene-seg (S3DIS-style) trainer loop on the synthetic room fixture."""
import os

import numpy as np

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.datasets.data_util import crop_pc, voxelize, get_class_weights


def test_voxelize_and_crop(rng_np):
    coord = rng_np.random((2000, 3)).astype(np.float32) * 4
    feat = rng_np.random((2000, 3)).astype(np.float32)
    label = rng_np.integers(0, 13, 2000)
    c, f, l = crop_pc(coord, feat, label, "train", voxel_size=0.2,
                      voxel_max=256, rng=rng_np)
    assert c.shape == (256, 3) and f.shape == (256, 3) and l.shape == (256,)
    assert (c.min(0) >= -1e-6).all()  # re-origined
    # val crop is deterministic given no shuffle
    c2, _, _ = crop_pc(coord.copy(), feat, label, "val", voxel_size=0.2,
                       voxel_max=256, shuffle=False, rng=rng_np)
    assert c2.shape == (256, 3)


def test_class_weights():
    w = get_class_weights([100, 300, 600], normalize=True)
    assert abs(w.sum() - 3.0) < 1e-5
    assert w[0] > w[2]  # rare class weighted higher


def test_scene_seg_loop(tmp_path):
    cfg = EasyConfig()
    cfg.update({
        "model": {
            "NAME": "BaseSeg",
            "encoder_args": {
                "NAME": "PointNextEncoder", "blocks": [1, 1, 1],
                "strides": [1, 4, 4], "width": 16, "in_channels": 4,
                "sa_layers": 1, "sa_use_res": False, "radius": 0.5,
                "nsample": 8,
                "group_args": {"NAME": "ballquery", "normalize_dp": True},
                "norm_args": {"norm": "bn"}, "act_args": {"act": "relu"},
                "conv_args": {"order": "conv-norm-act"}},
            "decoder_args": {"NAME": "PointNextDecoder"},
            "cls_args": {"NAME": "SegHead", "num_classes": 4,
                         "norm_args": {"norm": "bn"}}},
        "dataset": {"common": {"NAME": "SyntheticScene", "num_points": 128,
                               "size": 16},
                    "train": {"split": "train"}, "val": {"split": "val"}},
        "dataloader": {"num_workers": 0},
        "datatransforms": {"train": None, "val": None},
        "feature_keys": "x,heights",
        "criterion_args": {"NAME": "CrossEntropy"},
        "lr": 0.01, "optimizer": {"NAME": "adamw", "weight_decay": 1e-4},
        "sched": "cosine", "epochs": 2, "min_lr": 1e-5, "t_max": 2,
        "warmup_epochs": 0, "grad_norm_clip": 10, "val_freq": 1,
        "batch_size": 8, "val_batch_size": 8, "num_classes": 4, "seed": 0,
    })
    cfg.run_dir = str(tmp_path)
    cfg.run_name = None
    from adaptpoint_tpu.engine.seg_main import main
    best = main(cfg)
    assert best >= 0
