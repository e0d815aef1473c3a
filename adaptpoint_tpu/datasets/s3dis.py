"""S3DIS scene-segmentation dataset.

Parity: openpoints/dataset/s3dis/s3dis.py:12-146 (per-room .npy files, test
area split, per-item voxel crop to voxel_max points, rgb features, height
feature). A synthetic room fixture stands in when no data is downloaded.
"""
from __future__ import annotations

import logging
import os
import os.path as osp
from typing import Optional

import numpy as np

from .build import DATASETS
from .data_util import crop_pc

S3DIS_CLASSES = ["ceiling", "floor", "wall", "beam", "column", "window",
                 "door", "chair", "table", "bookcase", "sofa", "board",
                 "clutter"]
S3DIS_NUM_PER_CLASS = np.array(
    [3370714, 2856755, 4919229, 318158, 375640, 478001, 974733, 650464,
     791496, 88727, 1284130, 229758, 2272837], dtype=np.int64)

# per-class vis colors (parity: s3dis_sphere.py:34-47 class2color)
S3DIS_CMAP = np.array(
    [[0, 255, 0], [0, 0, 255], [0, 255, 255], [255, 255, 0], [255, 0, 255],
     [100, 100, 255], [200, 200, 100], [255, 0, 0], [170, 120, 200],
     [10, 200, 100], [200, 100, 100], [200, 200, 200], [50, 50, 50]],
    dtype=np.uint8)


@DATASETS.register_module()
class S3DIS:
    classes = S3DIS_CLASSES
    num_classes = 13
    num_per_class = S3DIS_NUM_PER_CLASS
    cmap = S3DIS_CMAP
    gravity_dim = 2

    def __init__(self, data_root: str = "data/S3DIS/s3disfull",
                 test_area: int = 5, voxel_size: float = 0.04,
                 voxel_max: Optional[int] = 24000, split: str = "train",
                 transform=None, loop: int = 1, presample: bool = False,
                 variable: bool = False, shuffle: bool = True, **kwargs):
        self.split = "train" if split == "train" else "val"
        self.voxel_size = voxel_size
        self.voxel_max = voxel_max
        self.transform = transform
        self.loop = loop
        self.shuffle = shuffle
        raw_root = osp.join(data_root, "raw")
        if not osp.isdir(raw_root):
            raise FileNotFoundError(f"{raw_root} not found — download S3DIS first")
        names = sorted(x[:-4] for x in os.listdir(raw_root) if "Area_" in x)
        if split == "train":
            names = [x for x in names if f"Area_{test_area}" not in x]
        else:
            names = [x for x in names if f"Area_{test_area}" in x]
        self.raw_root = raw_root
        self.data_list = names
        logging.info("S3DIS %s: %d rooms", split, len(names))

    def __len__(self):
        return len(self.data_list) * self.loop

    def get(self, idx: int, rng: np.random.Generator):
        name = self.data_list[idx % len(self.data_list)]
        cdata = np.load(osp.join(self.raw_root, name + ".npy")).astype(np.float32)
        cdata[:, :3] -= cdata[:, :3].min(0)
        coord, feat, label = cdata[:, :3], cdata[:, 3:6], cdata[:, 6:7]
        coord, feat, label = crop_pc(
            coord, feat, label.reshape(-1), self.split, self.voxel_size,
            self.voxel_max, downsample=True, shuffle=self.shuffle, rng=rng)
        data = {"pos": coord, "x": feat, "y": label}
        if self.transform is not None:
            data = self.transform(data, rng)
        if "heights" not in data:
            g = self.gravity_dim
            data["heights"] = data["pos"][:, g:g + 1].astype(np.float32)
        return data


@DATASETS.register_module()
class SyntheticScene:
    """Synthetic 'room' fixture for scene-seg tests: layered planes with
    height-correlated labels."""

    classes = S3DIS_CLASSES[:4]
    num_classes = 4
    gravity_dim = 2

    def __init__(self, split="train", num_points=256, size=16, transform=None,
                 seed=0, **kwargs):
        self.split = split
        self.num_points = num_points
        self.size = size
        self.transform = transform
        self.seed = seed

    def __len__(self):
        return self.size

    def get(self, idx: int, rng: np.random.Generator):
        n = self.num_points
        pos = rng.random((n, 3)).astype(np.float32) * [4, 4, 3]
        y = np.clip((pos[:, 2] / 3.0 * 4).astype(np.int64), 0, 3)
        rgb = (np.eye(4)[y][:, :3] * 255).astype(np.float32)
        data = {"pos": pos, "x": rgb, "y": y}
        if self.transform is not None:
            data = self.transform(data, rng)
        data["heights"] = data["pos"][:, 2:3].astype(np.float32)
        return data


@DATASETS.register_module()
class S3DISSphere:
    """Sphere-sampled S3DIS with Tukey-potential scheduling.

    Parity: openpoints/dataset/s3dis/s3dis_sphere.py:15-348 — grid-subsample
    each area, build a KD-tree (our C++ kdtree), pick sphere centers by
    minimum potential, add Gaussian center noise (in_radius/10), take the
    num_points nearest in-radius points (pad by resampling, mask marks real
    points), and bump potentials with Tukey weights. Also precomputes the
    original->subcloud projection used by sphere validation. Deterministic:
    schedule + noise are precomputed from a fixed seed like the reference's
    pickled iterinds.
    """

    classes = S3DIS_CLASSES
    num_classes = 13
    num_per_class = S3DIS_NUM_PER_CLASS
    color_mean = np.array([0.5136457, 0.49523646, 0.44921124])
    color_std = np.array([0.18308958, 0.18415008, 0.19252081])
    cmap = S3DIS_CMAP
    gravity_dim = 2

    def __init__(self, data_root: str = "data/S3DIS/s3disfull",
                 voxel_size: float = 0.04, in_radius: float = 2.0,
                 num_points: int = 16384, num_steps: int = 500,
                 num_epochs: int = 100, split: str = "train",
                 transform=None, seed: int = 0, **kwargs):
        from ..ops.cpu.kdtree_knn import KDTree
        self.split = "train" if split == "train" else "val"
        self.in_radius = in_radius
        self.num_points = num_points
        self.num_steps = num_steps
        self.transform = transform
        self.epoch = 0
        raw_root = osp.join(data_root, "raw")
        if not osp.isdir(raw_root):
            raise FileNotFoundError(f"{raw_root} not found — download S3DIS first")
        names = sorted(x[:-4] for x in os.listdir(raw_root) if "Area_" in x)
        areas = sorted({n.split("_room")[0].split("_office")[0][:6] for n in names})
        # cloud = one Area (rooms concatenated), reference lines 79-147
        test_areas = [a for a in areas if a == "Area_5"]
        train_areas = [a for a in areas if a != "Area_5"]
        self._area_names = train_areas if self.split == "train" else test_areas
        self.clouds_points, self.clouds_colors, self.clouds_labels = [], [], []
        self.sub_points, self.sub_colors, self.sub_labels = [], [], []
        self.sub_trees, self.projections = [], []
        cache_dir = osp.join(data_root, "processed")
        os.makedirs(cache_dir, exist_ok=True)
        for area in self._area_names:
            cache = osp.join(cache_dir,
                             f"{area}_{voxel_size:.3f}_sphere.npz")
            if osp.isfile(cache):
                z = np.load(cache)
                pts, rgb, lab = z["pts"], z["rgb"], z["lab"]
                spts, srgb, slab, proj = (z["spts"], z["srgb"], z["slab"],
                                          z["proj"])
            else:
                rooms = [n for n in names if n.startswith(area)]
                blobs = [np.load(osp.join(raw_root, r + ".npy")).astype(
                    np.float32) for r in rooms]
                cloud = np.concatenate(blobs, 0)
                pts, rgb = cloud[:, :3], cloud[:, 3:6]
                lab = cloud[:, 6].astype(np.int32)
                spts, srgb, slab = crop_pc(
                    pts, rgb, lab, "train", voxel_size, None,
                    downsample=True, shuffle=False,
                    rng=np.random.default_rng(seed))
                tree = KDTree(spts[:, :3])
                proj = tree.query(pts, 1)[0][:, 0]
                np.savez(cache, pts=pts, rgb=rgb, lab=lab, spts=spts,
                         srgb=srgb, slab=slab, proj=proj)
            self.clouds_points.append(pts)
            self.clouds_colors.append(rgb)
            self.clouds_labels.append(lab)
            self.sub_points.append(np.asarray(spts[:, :3], np.float32))
            self.sub_colors.append(np.asarray(srgb, np.float32))
            self.sub_labels.append(np.asarray(slab, np.int64).reshape(-1))
            self.sub_trees.append(KDTree(self.sub_points[-1]))
            self.projections.append(np.asarray(proj, np.int64))
        self._build_schedule(num_epochs, seed)
        logging.info("S3DISSphere %s: %d areas, %d steps/epoch",
                     split, len(self._area_names), num_steps)

    def _build_schedule(self, num_epochs: int, seed: int):
        """Min-potential sphere schedule (s3dis_sphere.py:204-252)."""
        rng = np.random.default_rng(seed)
        potentials = [rng.random(p.shape[0]) * 1e-3 for p in self.sub_points]
        self.cloud_inds, self.point_inds, self.noise = [], [], []
        r2 = self.in_radius ** 2
        for _ in range(num_epochs * self.num_steps):
            ci = int(np.argmin([p.min() for p in potentials]))
            pi = int(np.argmin(potentials[ci]))
            noise = rng.normal(scale=self.in_radius / 10, size=3)
            self.cloud_inds.append(ci)
            self.point_inds.append(pi)
            self.noise.append(noise.astype(np.float32))
            pick = self.sub_points[ci][pi] + noise
            q = self.sub_trees[ci].query_radius(pick, self.in_radius,
                                                self.num_points)
            d2 = ((self.sub_points[ci][q] - pick) ** 2).sum(-1)
            tukey = np.square(1 - d2 / r2)
            tukey[d2 > r2] = 0
            potentials[ci][q] += tukey

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.num_steps

    def get(self, idx: int, rng: np.random.Generator):
        step = (idx + self.epoch * self.num_steps) % len(self.cloud_inds)
        ci, pi = self.cloud_inds[step], self.point_inds[step]
        pick = self.sub_points[ci][pi] + self.noise[step]
        q = self.sub_trees[ci].query_radius(pick, self.in_radius,
                                            self.num_points)
        n_real = q.shape[0]
        if n_real < self.num_points:
            pad = rng.choice(n_real, self.num_points - n_real)
            q = np.concatenate([q, q[pad]])
        order = rng.permutation(self.num_points)
        q = q[order]
        mask = (order < n_real).astype(np.int32)
        pos = (self.sub_points[ci][q] - pick).astype(np.float32)
        data = {"pos": pos,
                "x": self.sub_colors[ci][q].astype(np.float32),
                "y": self.sub_labels[ci][q],
                "mask": mask,
                "cloud_index": np.int64(ci),
                "input_inds": q.astype(np.int64)}
        if self.transform is not None:
            data = self.transform(data, rng)
        if "heights" not in data:
            data["heights"] = (pick[2] + pos[:, 2:3]).astype(np.float32)
        return data
