"""Scene datasets: ScanNetV2, SemanticKITTI, ShapeNet55.

Parity: openpoints/dataset/scannetv2/scannet.py:64-180 (per-scene .pth with
coord/color/label, voxel crop), openpoints/dataset/semantic_kitti (velodyne
.bin + .label with the learning_map remap, grid subsample), and
dataset/shapenet/shapenet55 (npz point lists for MAE pretraining). All follow
the numpy ``get(idx, rng)`` loader protocol; they raise FileNotFoundError
when data isn't downloaded (synthetic fixtures cover the training loops in
tests).
"""
from __future__ import annotations

import glob
import logging
import os
import os.path as osp
from typing import Optional

import numpy as np

from .build import DATASETS
from .data_util import crop_pc

SCANNET_CLASSES = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]

# semantic-kitti 19-class learning map (parity: semantic_kitti config)
KITTI_LEARNING_MAP = {
    0: 0, 1: 0, 10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5, 30: 6,
    31: 7, 32: 8, 40: 9, 44: 10, 48: 11, 49: 12, 50: 13, 51: 14, 52: 0,
    60: 9, 70: 15, 71: 16, 72: 17, 80: 18, 81: 19, 99: 0, 252: 1, 253: 7,
    254: 6, 255: 8, 256: 5, 257: 5, 258: 4, 259: 5,
}


@DATASETS.register_module()
class ScanNet:
    """ScanNetV2 semantic segmentation (20 classes, ignore 255 -> -100)."""

    classes = SCANNET_CLASSES
    num_classes = 20
    gravity_dim = 2

    def __init__(self, data_root: str = "data/ScanNet", split: str = "train",
                 voxel_size: float = 0.04, voxel_max: Optional[int] = 24000,
                 transform=None, loop: int = 1, shuffle: bool = True,
                 **kwargs):
        self.split = "train" if split == "train" else "val"
        self.voxel_size = voxel_size
        self.voxel_max = voxel_max
        self.transform = transform
        self.loop = loop
        self.shuffle = shuffle
        pattern = osp.join(data_root, self.split, "*.pth")
        self.files = sorted(glob.glob(pattern))
        if not self.files:
            raise FileNotFoundError(f"no ScanNet scenes under {pattern}")
        logging.info("ScanNet %s: %d scenes", split, len(self.files))

    def __len__(self):
        return len(self.files) * self.loop

    def get(self, idx: int, rng: np.random.Generator):
        import torch
        # weights_only=False: the official preprocessing pickles numpy
        # arrays, which torch>=2.6 refuses under the weights-only default
        data = torch.load(self.files[idx % len(self.files)],
                          map_location="cpu", weights_only=False)
        if isinstance(data, (list, tuple)):
            coord, feat, label = (np.asarray(data[0], np.float32),
                                  np.asarray(data[1], np.float32),
                                  np.asarray(data[2], np.int64))
        else:
            coord = np.asarray(data["coord"], np.float32)
            feat = np.asarray(data.get("color", data.get("feat")), np.float32)
            label = np.asarray(data["semantic_gt"], np.int64).reshape(-1)
        coord, feat, label = crop_pc(coord, feat, label, self.split,
                                     self.voxel_size, self.voxel_max,
                                     shuffle=self.shuffle, rng=rng)
        out = {"pos": coord, "x": feat, "y": label}
        if self.transform is not None:
            out = self.transform(out, rng)
        if "heights" not in out:
            g = self.gravity_dim
            out["heights"] = out["pos"][:, g:g + 1].astype(np.float32)
        return out


@DATASETS.register_module()
class SemanticKITTI:
    """SemanticKITTI scans: velodyne .bin (x,y,z,remission) + .label files."""

    num_classes = 19
    gravity_dim = 2
    _SPLITS = {"train": ["00", "01", "02", "03", "04", "05", "06", "07",
                         "09", "10"],
               "val": ["08"], "test": ["11", "12", "13", "14", "15", "16",
                                       "17", "18", "19", "20", "21"]}

    def __init__(self, data_root: str = "data/SemanticKITTI/dataset/sequences",
                 split: str = "train", voxel_size: float = 0.06,
                 voxel_max: Optional[int] = 24000, transform=None,
                 shuffle: bool = True, **kwargs):
        self.split = "train" if split == "train" else "val"
        self.voxel_size = voxel_size
        self.voxel_max = voxel_max
        self.transform = transform
        self.shuffle = shuffle
        seqs = self._SPLITS[self.split]
        self.files = sorted(sum((glob.glob(osp.join(data_root, s,
                                                    "velodyne", "*.bin"))
                                 for s in seqs), []))
        if not self.files:
            raise FileNotFoundError(f"no KITTI scans under {data_root}")
        lut_size = max(KITTI_LEARNING_MAP) + 1
        self.lut = np.zeros(lut_size, np.int64)
        for k, v in KITTI_LEARNING_MAP.items():
            self.lut[k] = v
        logging.info("SemanticKITTI %s: %d scans", split, len(self.files))

    def __len__(self):
        return len(self.files)

    def get(self, idx: int, rng: np.random.Generator):
        path = self.files[idx]
        scan = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
        coord, remission = scan[:, :3], scan[:, 3:4]
        label_path = path.replace("velodyne", "labels").replace(".bin",
                                                                ".label")
        if osp.exists(label_path):
            raw = np.fromfile(label_path, dtype=np.uint32) & 0xFFFF
            label = self.lut[np.clip(raw, 0, len(self.lut) - 1)]
        else:
            label = np.zeros(len(coord), np.int64)
        coord, remission, label = crop_pc(coord, remission, label, self.split,
                                          self.voxel_size, self.voxel_max,
                                          shuffle=self.shuffle, rng=rng)
        out = {"pos": coord, "x": remission, "y": label}
        if self.transform is not None:
            out = self.transform(out, rng)
        if "heights" not in out:
            out["heights"] = out["pos"][:, 2:3].astype(np.float32)
        return out


@DATASETS.register_module(name="ShapeNet")
@DATASETS.register_module(name="ShapeNet55")
class ShapeNet55:
    """ShapeNet-55 clouds for MAE pretraining (npy/npz per shape).

    Also registered as ``ShapeNet`` — the reference's NAME for this loader
    (openpoints/dataset/shapenet/shapenet55.py:11). When the reference's
    on-disk layout is present ({split}.txt file list + shapenet_pc/ dir of
    per-shape npy), it is used; otherwise shapes are globbed from
    data_root[/split]. ``n_points`` is accepted as the reference's kwarg
    spelling of num_points."""

    num_classes = 55
    gravity_dim = 1

    def __init__(self, data_root: str = "data/ShapeNet55", split: str = "train",
                 num_points: int = 1024, n_points: int = None, transform=None,
                 **kwargs):
        self.split = split
        self.num_points = int(n_points) if n_points is not None else num_points
        self.transform = transform
        subset = "train" if split == "train" else "test"
        list_file = osp.join(data_root, f"{subset}.txt")
        pc_dir = osp.join(data_root, "shapenet_pc")
        if osp.isfile(list_file) and osp.isdir(pc_dir):
            with open(list_file) as f:
                names = [ln.strip() for ln in f if ln.strip()]
            self.files = [osp.join(pc_dir, n) for n in names]
        else:
            self.files = sorted(glob.glob(osp.join(data_root, split, "*.np[yz]")))
        if not self.files:
            self.files = sorted(glob.glob(osp.join(data_root, "*.np[yz]")))
        if not self.files:
            raise FileNotFoundError(f"no ShapeNet55 shapes under {data_root}")

    def __len__(self):
        return len(self.files)

    def get(self, idx: int, rng: np.random.Generator):
        arr = np.load(self.files[idx])
        if hasattr(arr, "files"):
            arr = arr[arr.files[0]]
        pts = np.asarray(arr, np.float32)[:, :3]
        if len(pts) >= self.num_points:
            sel = rng.choice(len(pts), self.num_points, replace=False)
        else:
            sel = rng.choice(len(pts), self.num_points, replace=True)
        data = {"pos": pts[sel], "y": np.int64(0)}
        if self.transform is not None:
            data = self.transform(data, rng)
        return data


@DATASETS.register_module()
class MP40:
    """Matterport3D object classification, mpcat40 labels
    (parity: openpoints/dataset/matterport3d/matterport3d.py:32-210:
    preprocessed h5 of 2048-pt objects with rgb; positive-label filter and
    mpcat40 remap are assumed done at preprocessing)."""

    num_classes = 40
    gravity_dim = 1

    def __init__(self, data_dir: str = "data/Matterport3D", split: str = "train",
                 num_points: int = 1024, use_normal: bool = False,
                 transform=None, **kwargs):
        import h5py
        self.split = split
        self.num_points = num_points
        self.use_normal = use_normal
        self.transform = transform
        path = osp.join(data_dir,
                        f"matterport3dobjects_{split}_2048pts.h5")
        if not osp.isfile(path):
            raise FileNotFoundError(f"{path} not found")
        with h5py.File(path, "r") as f:
            grp = f
            if "data" in f and isinstance(f["data"], h5py.Group):
                grp = f["data"]
            self.data = np.asarray(grp["data"], np.float32)
            self.labels = np.asarray(grp["label"], np.int64).reshape(-1)

    def __len__(self):
        return len(self.data)

    def get(self, idx: int, rng: np.random.Generator):
        pts = np.array(self.data[idx][: self.num_points], np.float32)
        if self.split == "train":
            rng.shuffle(pts)
        data = {"pos": pts[:, :3],
                "x": pts[:, 3:6 + 3 * self.use_normal],
                "y": np.int64(self.labels[idx])}
        if self.transform is not None:
            data = self.transform(data, rng)
        extra = [data["pos"]]
        if "heights" in data:
            extra.append(data["heights"])
        extra.append(data["x"])
        data["x"] = np.concatenate(extra, axis=1)
        data.pop("heights", None)
        return data
