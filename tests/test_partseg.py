"""Part-segmentation: model forward, metrics, refinement, trainer loop."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.utils.partseg import get_ins_mious, part_seg_refinement

PARTSEG_CFG = {
    "NAME": "BasePartSeg",
    "encoder_args": {
        "NAME": "PointNextEncoder",
        "blocks": [1, 1, 1], "strides": [1, 2, 2], "width": 16,
        "in_channels": 4, "sa_layers": 1, "sa_use_res": False,
        "radius": 0.15, "nsample": 8,
        "group_args": {"NAME": "ballquery", "normalize_dp": True},
        "norm_args": {"norm": "bn"}, "act_args": {"act": "relu"},
        "conv_args": {"order": "conv-norm-act"}},
    "decoder_args": {"NAME": "PointNextPartDecoder", "cls_map": "pointnet2",
                     "num_classes": 4},
    "cls_args": {"NAME": "SegHead", "num_classes": 8, "mlps": [32],
                 "norm_args": {"norm": "bn"}},
}


def test_basepartseg_forward(rng_np):
    model = build_model_from_cfg(PARTSEG_CFG)
    B, N = 2, 64
    pos = jnp.asarray(rng_np.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1)
    cls0 = jnp.zeros((B,), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), pos, x, cls0, training=False)
    out = model.apply(v, pos, x, cls0, training=False)
    assert out.shape == (B, N, 8)


def test_basepartseg_curvenet_clsmap(rng_np):
    cfg = dict(PARTSEG_CFG)
    cfg["decoder_args"] = {"NAME": "PointNextPartDecoder",
                           "cls_map": "curvenet", "num_classes": 4}
    model = build_model_from_cfg(cfg)
    B, N = 2, 64
    pos = jnp.asarray(rng_np.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1)
    cls0 = jnp.ones((B,), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), pos, x, cls0, training=False)
    out = model.apply(v, pos, x, cls0, training=False)
    assert out.shape == (B, N, 8)


def test_ins_miou_perfect_prediction():
    cls2parts = [[0, 1], [2, 3]]
    pred = np.array([[0, 0, 1, 1], [2, 3, 3, 2]])
    mious = get_ins_mious(pred, pred.copy(), np.array([0, 1]), cls2parts)
    assert mious == [100.0, 100.0]


def test_ins_miou_half():
    cls2parts = [[0, 1]]
    pred = np.array([[0, 0, 0, 0]])
    target = np.array([[0, 0, 1, 1]])
    mious = get_ins_mious(pred, target, np.array([0]), cls2parts)
    # part0: I=2 U=4 -> 50; part1: I=0 U=2 -> 0; mean 25
    assert abs(mious[0] - 25.0) < 1e-6


def test_part_seg_refinement_fixes_outlier():
    cls2parts = [[0, 1]]
    # 20 points: all label 0 except one stray label 1 in the middle of a blob
    pos = np.random.default_rng(0).standard_normal((1, 20, 3)).astype(np.float32)
    pred = np.zeros((1, 20), np.int64)
    pred[0, 7] = 1
    out = part_seg_refinement(pred, pos, np.array([0]), cls2parts, n=5)
    assert (out == 0).all()


@pytest.mark.slow
def test_partseg_trainer_loop(tmp_path):
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.engine.partseg_main import main
    cfg = EasyConfig()
    cfg.update({
        "model": PARTSEG_CFG,
        "dataset": {"common": {"NAME": "SyntheticPartSeg", "num_points": 64,
                               "size": 32},
                    "train": {"split": "train"}, "val": {"split": "val"}},
        "dataloader": {"num_workers": 0},
        "datatransforms": {"train": None, "val": None},
        "criterion_args": {"NAME": "SmoothCrossEntropy", "label_smoothing": 0.2},
        "lr": 0.002, "optimizer": {"NAME": "adamw", "weight_decay": 0.05},
        "sched": "cosine", "epochs": 1, "min_lr": 1e-5, "t_max": 1,
        "warmup_epochs": 0,
        "grad_norm_clip": 10, "val_freq": 1, "batch_size": 8,
        "val_batch_size": 8, "num_classes": 8, "num_points": 64,
        "mode": "train", "seed": 1,
    })
    cfg.run_dir = str(tmp_path)
    cfg.run_name = None
    best = main(cfg)
    assert best >= 0
