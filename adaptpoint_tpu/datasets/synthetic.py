"""Synthetic classification fixture (no h5 downloads needed).

Stands in for ScanObjectNN in tests and smoke training (SURVEY.md §4
"fake-dataset fixture to avoid the real h5 downloads"): each class is a
distinct parametric shape family (sphere/box/line blends) with per-sample
noise, so a model can actually fit it.
"""
from __future__ import annotations

import numpy as np

from .build import DATASETS
from .scanobjectnn import _ClsPointsBase


def _make_cloud(rng: np.random.Generator, cls: int, num_points: int) -> np.ndarray:
    t = rng.random((num_points, 3)).astype(np.float32) * 2 - 1
    k = cls % 5
    if k == 0:  # sphere shell
        p = t / (np.linalg.norm(t, axis=1, keepdims=True) + 1e-6)
    elif k == 1:  # box surface
        ax = rng.integers(0, 3, num_points)
        p = t.copy()
        p[np.arange(num_points), ax] = np.sign(p[np.arange(num_points), ax])
    elif k == 2:  # cylinder
        p = t.copy()
        n = np.linalg.norm(p[:, :2], axis=1, keepdims=True) + 1e-6
        p[:, :2] /= n
    elif k == 3:  # plane
        p = t.copy()
        p[:, 2] *= 0.05
    else:  # cross of lines
        p = t * np.eye(3)[rng.integers(0, 3, num_points)]
    # anisotropic stretch per class group — survives unit-sphere normalization
    stretch = np.array([1.0, 1.0 / (1.0 + 0.7 * (cls // 5)), 1.0], np.float32)
    return (p * stretch + rng.standard_normal((num_points, 3)).astype(np.float32) * 0.02)


@DATASETS.register_module()
class SyntheticPartSeg:
    """Synthetic part-seg fixture: 4 shape classes, parts = spatial halves
    mapped into each class's own label range (ShapeNetPart-style layout)."""

    classes = [f"class{i}" for i in range(4)]
    cls2parts = [[0, 1], [2, 3], [4, 5], [6, 7]]
    num_classes = 8  # part labels
    gravity_dim = 1

    def __init__(self, split: str = "train", num_points: int = 128,
                 size: int = 32, transform=None, seed: int = 0, **kwargs):
        self.split = split
        self.num_points = num_points
        self.transform = transform
        rng = np.random.default_rng((seed, 0 if split == "train" else 1))
        self.labels = np.arange(size) % 4
        self.points = np.stack([
            _make_cloud(rng, int(c), num_points) for c in self.labels])

    def __len__(self):
        return self.points.shape[0]

    def get(self, idx: int, rng: np.random.Generator):
        pc = np.array(self.points[idx], np.float32)
        cls = int(self.labels[idx])
        seg = (pc[:, 0] > 0).astype(np.int64) + self.cls2parts[cls][0]
        data = {"pos": pc, "y": seg, "cls": np.int64(cls)}
        if self.transform is not None:
            data = self.transform(data, rng)
        if "heights" not in data:
            g = self.gravity_dim
            data["heights"] = (pc[:, g:g + 1] - pc[:, g:g + 1].min()).astype(np.float32)
        data["x"] = np.concatenate([data["pos"], data["heights"]], axis=1)
        data.pop("heights", None)
        return data


@DATASETS.register_module()
class SyntheticCls(_ClsPointsBase):
    def __init__(self, split: str = "train", num_points: int = 1024,
                 num_classes: int = 15, size: int = 64, transform=None,
                 seed: int = 0, **kwargs):
        self.split = split
        self.num_points = num_points
        self.num_classes = num_classes
        self.transform = transform
        rng = np.random.default_rng((seed, 0 if split == "train" else 1))
        self.labels = np.arange(size) % num_classes
        self.points = np.stack([
            _make_cloud(rng, int(c), num_points) for c in self.labels])
        self.classes = [f"class{i}" for i in range(num_classes)]


def _make_cloud_hard(rng: np.random.Generator, cls: int,
                     num_points: int) -> np.ndarray:
    """HARD synthetic protocol (round 3): 15 classes defined by OVERLAPPING
    class-conditional distributions over superellipsoid shape parameters,
    plus per-sample bending, tilt, partial occlusion and background
    outliers (ScanObjectNN-hardest-style artifacts). Unlike ``_make_cloud``
    (5 clean shape families x 3 stretch groups — linearly separable, OA
    saturates at 100%), neighboring classes here share parameter support, so
    clean accuracy plateaus well below 100% and corruption robustness
    separates augmentation methods (VERDICT r2 item 3)."""
    fam = cls % 5
    grp = cls // 5
    # overlapping parameter draws: sigma is a large fraction of the
    # inter-class mean gap in every coordinate
    e1 = np.clip(rng.normal(0.3 + 0.45 * fam, 0.22), 0.15, 3.0)
    e2 = np.clip(rng.normal(0.5 + 0.45 * ((fam + 2) % 5), 0.22), 0.15, 3.0)
    aspect = float(np.exp(rng.normal(0.40 * grp - 0.40, 0.22)))
    bend = rng.normal(0.12 * (grp - 1), 0.22)

    eta = rng.uniform(-np.pi / 2, np.pi / 2, num_points)
    om = rng.uniform(-np.pi, np.pi, num_points)

    def spow(w, e):
        return np.sign(w) * np.abs(w) ** e

    p = np.stack([spow(np.cos(eta), e1) * spow(np.cos(om), e2),
                  spow(np.cos(eta), e1) * spow(np.sin(om), e2),
                  spow(np.sin(eta), e1) * aspect], axis=1).astype(np.float32)
    p[:, 0] += bend * p[:, 2] ** 2  # random bend along z

    # random tilt (up to ~30deg) + free z-rotation: hardest-variant pose noise
    az = rng.uniform(-np.pi, np.pi)
    tilt = rng.uniform(0, np.pi / 6)
    ca, sa, ct, st = np.cos(az), np.sin(az), np.cos(tilt), np.sin(tilt)
    Rz = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]], np.float32)
    Rx = np.array([[1, 0, 0], [0, ct, -st], [0, st, ct]], np.float32)
    p = p @ (Rz @ Rx).T

    # partial occlusion: slice off a random 15-40% half-space chunk
    if rng.random() < 0.5:
        d = p @ (lambda v: v / np.linalg.norm(v))(rng.standard_normal(3))
        thresh = np.quantile(d, rng.uniform(0.60, 0.85))
        keep = np.nonzero(d <= thresh)[0]
        pad = rng.choice(keep, num_points - len(keep), replace=True)
        p = p[np.concatenate([keep, pad])]

    # background outliers: 2-10% uniform points (scan artifacts)
    n_out = int(num_points * rng.uniform(0.01, 0.06))
    if n_out:
        out_idx = rng.choice(num_points, n_out, replace=False)
        p[out_idx] = rng.uniform(-1, 1, (n_out, 3)).astype(np.float32)

    p = p + rng.standard_normal((num_points, 3)).astype(np.float32) * 0.02
    return p.astype(np.float32)
