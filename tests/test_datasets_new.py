"""Fixture-driven smoke tests for the round-4 dataset-NAME additions:
ModelNet (normal-resampled txt release), the ShapeNet alias's reference
file-list layout, and ShapeNetPartCurve."""
import json

import numpy as np
import pytest

from adaptpoint_tpu.datasets.modelnet import ModelNet
from adaptpoint_tpu.datasets.scenes import ShapeNet55
from adaptpoint_tpu.datasets.build import DATASETS
from adaptpoint_tpu.datasets.shapenetpart import ShapeNetPartCurve


def _rng():
    return np.random.default_rng(0)


def test_modelnet_normal_resampled(tmp_path):
    root = tmp_path / "modelnet40_normal_resampled"
    names = ["airplane", "chair"]
    (root).mkdir()
    (root / "modelnet40_shape_names.txt").write_text("\n".join(names) + "\n")
    train_ids, test_ids = [], []
    rng = _rng()
    for n in names:
        (root / n).mkdir()
        for i, bucket in [(1, train_ids), (2, test_ids)]:
            sid = f"{n}_{i:04d}"
            pts = rng.normal(size=(300, 6)).astype(np.float32)
            np.savetxt(str(root / n / f"{sid}.txt"), pts, delimiter=",")
            bucket.append(sid)
    (root / "modelnet40_train.txt").write_text("\n".join(train_ids) + "\n")
    (root / "modelnet40_test.txt").write_text("\n".join(test_ids) + "\n")

    ds = ModelNet(data_dir=str(tmp_path), num_points=256, split="train")
    assert len(ds) == 2
    d = ds.get(0, _rng())
    assert d["pos"].shape == (256, 3) and d["x"].shape == (256, 3)
    assert d["y"] in (0, 1)

    ds_n = ModelNet(data_dir=str(tmp_path), num_points=128, split="test",
                    use_normals=True)
    d = ds_n.get(1, _rng())
    assert d["x"].shape == (128, 6)  # pos || normals


def test_shapenet_alias_file_list_layout(tmp_path):
    pc = tmp_path / "shapenet_pc"
    pc.mkdir()
    rng = _rng()
    names = []
    for i in range(3):
        n = f"02691156-m{i}.npy"
        np.save(str(pc / n), rng.normal(size=(500, 3)).astype(np.float32))
        names.append(n)
    (tmp_path / "train.txt").write_text("\n".join(names) + "\n")
    cls = DATASETS.module_dict["ShapeNet"]
    assert cls is ShapeNet55
    ds = cls(data_root=str(tmp_path), split="train", n_points=128)
    assert len(ds) == 3
    d = ds.get(0, _rng())
    assert d["pos"].shape == (128, 3)


@pytest.fixture
def partseg_h5_root(tmp_path):
    import h5py
    rng = _rng()
    for split in ("train", "val", "test"):
        with h5py.File(str(tmp_path / f"ply_data_{split}0.h5"), "w") as f:
            f["data"] = rng.normal(size=(4, 64, 3)).astype(np.float32)
            f["label"] = rng.integers(0, 16, size=(4, 1)).astype(np.int64)
            f["pid"] = rng.integers(0, 50, size=(4, 64)).astype(np.int64)
    return tmp_path


def test_shapenetpart_curve(partseg_h5_root):
    ds = ShapeNetPartCurve(data_root=str(partseg_h5_root), num_points=64,
                           split="train")
    assert len(ds) == 4  # literal split: train shard only, no trainval merge
    d = ds.get(0, _rng())
    assert d["pos"].shape == (64, 3) and d["y"].shape == (64,)
    assert "x" not in d  # no transform -> no heights -> curve x is absent
    ds_tv = ShapeNetPartCurve(data_root=str(partseg_h5_root), num_points=64,
                              split="trainval")
    assert len(ds_tv) == 8


def test_shapenetpart_curve_class_choice(partseg_h5_root):
    import h5py
    with h5py.File(str(partseg_h5_root / "ply_data_train0.h5"), "r+") as f:
        lab = np.asarray(f["label"])
        lab[:2] = 4  # chair
        del f["label"]
        f["label"] = lab
    ds = ShapeNetPartCurve(data_root=str(partseg_h5_root), num_points=64,
                           split="train", class_choice="chair")
    assert len(ds) >= 2
    assert ds.seg_num_all == 4 and ds.seg_start_index == 12
