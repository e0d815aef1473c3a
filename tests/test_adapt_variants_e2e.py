"""e2e coverage for the two round-3-untested adversarial trainers:

1. the part-seg GAN loop (engine/partseg_main.py use_adapt branch; reference
   examples/shapenetpart/train_adapt.py:119-278) — G/D build, per-batch gan
   steps, the fake pos/y/heights/cls buffer, and a seg epoch trained on it;
2. mode=adaptpoint_modelnet (engine/adapt_main.py; reference
   train_autoaug_modelnet.py) — incl. its phase-B RSMix-on-fake-buffer
   branch (:396-398), driven through examples/classification/main.py.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from adaptpoint_tpu.utils import EasyConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PARTSEG_MODEL = {
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


@pytest.mark.slow
def test_partseg_adapt_gan_loop(tmp_path, monkeypatch):
    import adaptpoint_tpu.engine.partseg_main as pm

    gan_metrics = []
    orig = pm.make_partseg_gan_step

    def recording(*a, **k):
        step = orig(*a, **k)

        def rec_step(state, batch, rng):
            new_state, gen, m = step(state, batch, rng)
            gan_metrics.append({k2: float(v) for k2, v in m.items()})
            return new_state, gen, m

        return rec_step

    monkeypatch.setattr(pm, "make_partseg_gan_step", recording)

    cfg = EasyConfig()
    cfg.update({
        "model": PARTSEG_MODEL,
        "dataset": {"common": {"NAME": "SyntheticPartSeg", "num_points": 64,
                               "size": 32},
                    "train": {"split": "train"}, "val": {"split": "val"}},
        "dataloader": {"num_workers": 0},
        "datatransforms": {"train": None, "val": None},
        "criterion_args": {"NAME": "SmoothCrossEntropy",
                           "label_smoothing": 0.2},
        "lr": 0.002, "optimizer": {"NAME": "adamw", "weight_decay": 0.05},
        "sched": "cosine", "epochs": 2, "min_lr": 1e-5, "t_max": 2,
        "warmup_epochs": 0, "grad_norm_clip": 10, "val_freq": 1,
        "batch_size": 8, "val_batch_size": 8, "num_classes": 8,
        "num_points": 64, "seed": 1,
        "mode": "adaptpoint",
        "adaptmodel_gan": {"NAME": "AdaptPoint_Augmentor", "w_num_anchor": 4,
                           "w_sigma": 0.5, "w_R_range": 10, "w_S_range": 3,
                           "w_T_range": 0.25},
        "adaptmodel_dis": {"NAME": "PointDiscriminator1", "num_classes": 8,
                           "normal_channel": False},
        "adaptpoint_params": {"lr_generator": 1e-4, "lr_discriminator": 4e-4,
                              "b1": 0.5, "b2": 0.999, "hardratio_std": 2,
                              "hardratio_s": 3, "hardratio": 3},
    })
    cfg.run_dir = str(tmp_path)
    cfg.run_name = None

    best = pm.main(cfg)

    # the GAN step ran once per train batch per epoch (32/8 * 2)
    assert len(gan_metrics) == 8
    gl = [m["g_loss"] for m in gan_metrics]
    dl = [m["d_loss"] for m in gan_metrics]
    assert all(np.isfinite(gl)) and all(np.isfinite(dl))
    # adversarial-only objectives actually move (params are being updated)
    assert max(gl) - min(gl) > 1e-5 and max(dl) - min(dl) > 1e-5
    # the GAN pair was checkpointed and the seg model trained on the buffer
    assert os.path.exists(os.path.join(cfg.run_dir, "model_gan.msgpack"))
    assert best >= 0


@pytest.mark.slow
def test_adaptpoint_modelnet_mode_rsmix_phase_b(tmp_path, monkeypatch):
    """mode=adaptpoint_modelnet direct-call path: the phase-B epoch must go
    through train_one_epoch_rsmix on the FAKE buffer (the modelnet-variant
    difference, train_autoaug_modelnet.py:396-398)."""
    import adaptpoint_tpu.engine.adapt_main as am
    from adaptpoint_tpu.engine import corrupt_main as cm

    calls = {"rsmix": 0}
    orig = cm.train_one_epoch_rsmix

    def counting(*a, **k):
        calls["rsmix"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(cm, "train_one_epoch_rsmix", counting)

    cfg = EasyConfig()
    cfg.load(os.path.join(
        REPO, "cfgs/synthetic/pointnext-tiny_adaptpoint_modelnet.yaml"),
        recursive=True)
    cfg.update_opts(["epochs=2", "batch_size=16", "val_batch_size=16",
                     "dataset.common.size=32", "dataset.common.num_points=96",
                     "num_points=96"])
    cfg.run_dir = str(tmp_path)
    cfg.run_name = None

    best_val = am.main(cfg)
    assert calls["rsmix"] == 2  # every phase-B epoch used the rsmix path
    assert best_val > 0


@pytest.mark.slow
def test_adaptpoint_modelnet_mode_through_cli(tmp_path):
    """Same mode driven through the user-facing CLI dispatch."""
    env = dict(os.environ,
               JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               ADAPTPOINT_TPU_KERNELS="xla",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples/classification/main.py"),
         "--cfg",
         os.path.join(REPO,
                      "cfgs/synthetic/pointnext-tiny_adaptpoint_modelnet.yaml"),
         "epochs=1", "batch_size=16", "val_batch_size=16",
         "dataset.common.size=16", "dataset.common.num_points=96",
         "num_points=96", f"root_dir={tmp_path}"],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    # the run dir exists with the standard artifacts
    runs = [d for d, _, files in os.walk(tmp_path) if "cfg.yaml" in files]
    assert runs, "no run dir created"
    assert any("model_gan.msgpack" in os.listdir(d) for d in runs)


@pytest.mark.slow
def test_cli_test_mode_preserves_training_cfg(tmp_path):
    """mode=test on an existing run dir must not clobber the original
    training cfg.yaml (provenance); it dumps cfg_test.yaml instead."""
    env = dict(os.environ,
               JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               ADAPTPOINT_TPU_KERNELS="xla")
    cli = os.path.join(REPO, "examples/classification/main.py")
    cfg_path = os.path.join(REPO, "cfgs/synthetic/dgcnn-tiny.yaml")
    out = subprocess.run(
        [sys.executable, cli, "--cfg", cfg_path, "epochs=1",
         f"root_dir={tmp_path}"],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    run_dir = next(d for d, _, files in os.walk(tmp_path)
                   if "cfg.yaml" in files)
    orig_cfg = open(os.path.join(run_dir, "cfg.yaml")).read()
    ckpt = next(os.path.join(run_dir, "checkpoint", f)
                for f in os.listdir(os.path.join(run_dir, "checkpoint"))
                if f.endswith("_ckpt_best.msgpack"))
    out = subprocess.run(
        [sys.executable, cli, "--cfg", cfg_path, "mode=test",
         f"pretrained_path={ckpt}"],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert open(os.path.join(run_dir, "cfg.yaml")).read() == orig_cfg
    assert os.path.exists(os.path.join(run_dir, "cfg_test.yaml"))
