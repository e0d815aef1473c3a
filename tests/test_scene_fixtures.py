"""Byte-level fake scene datasets (VERDICT.md round-1 item 10): write files
in the REAL on-disk formats — ScanNetV2 torch .pth scenes, SemanticKITTI
velodyne .bin + .label pairs, ShapeNet55 .npy, Matterport3D (MP40) h5 — and
drive the actual parsers in adaptpoint_tpu/datasets/scenes.py over them."""
import os

import numpy as np
import pytest

from adaptpoint_tpu.datasets.scenes import (KITTI_LEARNING_MAP, MP40,
                                            ScanNet, SemanticKITTI,
                                            ShapeNet55)


def _rng():
    return np.random.default_rng(0)


def test_scannet_pth_scene(tmp_path):
    import torch
    rng = _rng()
    for split, n_scenes in [("train", 2), ("val", 1)]:
        d = tmp_path / split
        d.mkdir()
        for i in range(n_scenes):
            n = 5000
            coord = (rng.random((n, 3)) * 8).astype(np.float32)
            color = (rng.random((n, 3)) * 255).astype(np.float32)
            label = rng.integers(0, 20, n).astype(np.int64)
            label[:10] = 255  # ignore labels present in real scenes
            # the official preprocessing saves (coord, color, label) tuples
            torch.save((coord, color, label), str(d / f"scene{i:04d}_00.pth"))
    ds = ScanNet(data_root=str(tmp_path), split="train", voxel_size=0.1,
                 voxel_max=1024)
    assert len(ds) == 2
    out = ds.get(0, _rng())
    assert out["pos"].shape[1] == 3 and out["x"].shape[1] == 3
    assert out["pos"].shape[0] == out["y"].shape[0] <= 1024
    assert out["heights"].shape == (out["pos"].shape[0], 1)
    # dict-style scenes (some preprocessings save dicts)
    torch.save({"coord": np.zeros((100, 3), np.float32),
                "color": np.ones((100, 3), np.float32),
                "semantic_gt": np.zeros((100, 1), np.int64)},
               str(tmp_path / "val" / "scene9999_00.pth"))
    ds = ScanNet(data_root=str(tmp_path), split="val", voxel_size=0.1,
                 voxel_max=64)
    out = ds.get(1, _rng())
    assert np.isfinite(out["pos"]).all()


def test_semantickitti_bin_label(tmp_path):
    rng = _rng()
    for seq, n_scans in [("00", 2), ("08", 1)]:
        vdir = tmp_path / seq / "velodyne"
        ldir = tmp_path / seq / "labels"
        os.makedirs(vdir)
        os.makedirs(ldir)
        for i in range(n_scans):
            n = 4000
            scan = np.zeros((n, 4), np.float32)
            scan[:, :3] = (rng.random((n, 3)) * 50 - 25)
            scan[:, 3] = rng.random(n)  # remission
            scan.tofile(str(vdir / f"{i:06d}.bin"))
            # real labels pack semantic id (low 16 bits) | instance id (high)
            sem = rng.choice(list(KITTI_LEARNING_MAP), n).astype(np.uint32)
            inst = rng.integers(0, 100, n).astype(np.uint32) << 16
            (sem | inst).tofile(str(ldir / f"{i:06d}.label"))
    ds = SemanticKITTI(data_root=str(tmp_path), split="train",
                       voxel_size=0.2, voxel_max=2048)
    assert len(ds) == 2
    out = ds.get(0, _rng())
    assert out["pos"].shape[1] == 3 and out["x"].shape[1] == 1
    # labels remapped into [0, 19] via the learning map (instance bits
    # stripped)
    assert out["y"].min() >= 0 and out["y"].max() <= 19
    ds_val = SemanticKITTI(data_root=str(tmp_path), split="val",
                           voxel_size=0.2, voxel_max=2048)
    assert len(ds_val) == 1


def test_shapenet55_npy(tmp_path):
    rng = _rng()
    d = tmp_path / "train"
    d.mkdir()
    for i in range(3):
        np.save(str(d / f"02691156-{i}.npy"),
                rng.standard_normal((8192, 3)).astype(np.float32))
    ds = ShapeNet55(data_root=str(tmp_path), split="train", num_points=256)
    assert len(ds) == 3
    out = ds.get(1, _rng())
    assert out["pos"].shape == (256, 3)


def test_mp40_h5(tmp_path):
    import h5py
    rng = _rng()
    n, p = 6, 2048
    with h5py.File(str(tmp_path / "matterport3dobjects_train_2048pts.h5"),
                   "w") as f:
        f.create_dataset("data", data=rng.standard_normal(
            (n, p, 6)).astype(np.float32))
        f.create_dataset("label", data=rng.integers(0, 40, n))
    ds = MP40(data_dir=str(tmp_path), split="train", num_points=512)
    assert len(ds) == 6
    out = ds.get(0, _rng())
    # x = [pos || rgb] (no height transform applied here)
    assert out["pos"].shape == (512, 3)
    assert out["x"].shape == (512, 6)
    assert 0 <= int(out["y"]) < 40


def test_scannet_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ScanNet(data_root=str(tmp_path / "nope"))
