"""SimpleView: multi-view depth-image projection + per-view CNN.

Parity: openpoints/models/backbone/simpleview.py:32-140 (MVModel, MVFC) and
simpleview_util.py (PCViews: 6 orthographic views via euler rotations +
translation, points2depth soft splatting). The depth splat is a
segment-sum scatter (XLA) instead of the reference's index_add loop; the
per-view CNN is the same channels-16 ResNet-18-style stack.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import torch_linear_init

_TRANS = -1.4


def _euler2mat(angles):
    """z-y-x euler angles (V,3) -> rotation matrices (V,3,3)
    (parity: simpleview_util.py:8-57)."""
    z, y, x = angles[:, 0], angles[:, 1], angles[:, 2]
    cz, sz = np.cos(z), np.sin(z)
    cy, sy = np.cos(y), np.sin(y)
    cx, sx = np.cos(x), np.sin(x)
    zmat = np.stack([cz, -sz, np.zeros_like(z), sz, cz, np.zeros_like(z),
                     np.zeros_like(z), np.zeros_like(z), np.ones_like(z)],
                    1).reshape(-1, 3, 3)
    ymat = np.stack([cy, np.zeros_like(y), sy, np.zeros_like(y),
                     np.ones_like(y), np.zeros_like(y), -sy,
                     np.zeros_like(y), cy], 1).reshape(-1, 3, 3)
    xmat = np.stack([np.ones_like(x), np.zeros_like(x), np.zeros_like(x),
                     np.zeros_like(x), cx, -sx, np.zeros_like(x), sx, cx],
                    1).reshape(-1, 3, 3)
    return xmat @ ymat @ zmat


def _pc_views():
    """6 canonical views (parity: simpleview_util.py:235-253 PCViews)."""
    pi = math.pi
    angles = np.asarray([
        [0, 0, 0], [0, pi / 2, 0], [0, pi, 0], [0, -pi / 2, 0],
        [pi / 2, 0, 0], [-pi / 2, 0, 0]], np.float32)
    rot = _euler2mat(angles).astype(np.float32)  # (6,3,3)
    trans = np.asarray([[0, 0, _TRANS]] * 6, np.float32)
    return rot, trans


def points2depth(points: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Soft depth splat of (BV, N, 3) view-space points -> (BV, H, W, 1)
    (parity: simpleview_util.py:60-172 distribute/points2depth; XLA
    segment-sum instead of the CUDA index_add)."""
    bv, n, _ = points.shape
    h = w = resolution
    # perspective-ish divide like the reference (x/z, y/z)
    z = points[..., 2:3]
    xy = points[..., :2] / jnp.maximum(-z, 1e-4)
    coord = (xy + 1.0) / 2.0 * (resolution - 1)
    ix = jnp.clip(jnp.round(coord[..., 0]).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.round(coord[..., 1]).astype(jnp.int32), 0, h - 1)
    flat = iy * w + ix  # (BV, N)
    depth_val = 1.0 - jnp.abs(z[..., 0]) / jnp.max(jnp.abs(z[..., 0]) + 1e-6)

    def splat(idx, val):
        num = jax.ops.segment_sum(val, idx, num_segments=h * w)
        den = jax.ops.segment_sum(jnp.ones_like(val), idx, num_segments=h * w)
        return num / jnp.maximum(den, 1.0)

    img = jax.vmap(splat)(flat, depth_val)
    return img.reshape(bv, h, w, 1)


class _ResBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        identity = x
        h = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    use_bias=False)(x)
        h = nn.relu(nn.BatchNorm(use_running_average=not training,
                                 momentum=0.9)(h))
        h = nn.Conv(self.channels, (3, 3), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9)(h)
        if identity.shape != h.shape:
            identity = nn.Conv(self.channels, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False)(x)
        return nn.relu(h + identity)


@MODELS.register_module()
class MVModel(nn.Module):
    """parity: simpleview.py:61-140 (task='cls', resnet18-style, width 16)."""

    num_classes: int = 15
    channels: int = 16
    resolution: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, pos, x=None, training: bool = False):
        return self.forward_cls_feat(pos, x, training)

    def forward_cls_feat(self, pos, x=None, training: bool = False):
        rot, trans = _pc_views()
        b, n, _ = pos.shape
        v = rot.shape[0]
        rot_j = jnp.asarray(rot)
        trans_j = jnp.asarray(trans)
        pts = jnp.einsum("bnc,vcd->bvnd", pos, rot_j) + trans_j[None, :, None, :]
        img = points2depth(pts.reshape(b * v, n, 3), self.resolution)

        h = nn.Conv(self.channels, (3, 3), use_bias=False, name="stem")(img)
        h = nn.relu(nn.BatchNorm(use_running_average=not training,
                                 momentum=0.9, name="stem_bn")(h))
        ch = self.channels
        for i, stride in enumerate((1, 2, 2, 2)):
            h = _ResBlock(ch, stride, name=f"res{i}a")(h, training)
            h = _ResBlock(ch, 1, name=f"res{i}b")(h, training)
            ch *= 2
        feat = jnp.mean(h, axis=(1, 2))  # (B*V, C)
        feat = feat.reshape(b, v, -1)
        # MVFC (simpleview.py:32-58): per-view BN + dropout, flatten, MLP
        feat = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                            name="mv_bn")(feat)
        feat = nn.Dropout(self.dropout, deterministic=not training)(feat)
        feat = feat.reshape(b, -1)
        feat = nn.Dense(feat.shape[-1] // v, kernel_init=torch_linear_init,
                        name="fc1")(feat)
        feat = nn.relu(nn.BatchNorm(use_running_average=not training,
                                    momentum=0.9, name="fc_bn")(feat))
        feat = nn.Dropout(self.dropout, deterministic=not training)(feat)
        return nn.Dense(self.num_classes, kernel_init=torch_linear_init,
                        name="fc2")(feat)


@MODELS.register_module()
class MVFC(nn.Module):
    """Final multi-view FC head, registered standalone for cfg-name parity
    (reference simpleview.py:32-58 registers it as a MODELS entry): per-view
    BN + dropout, flatten across views, Linear-BN-ReLU-Dropout-Linear."""

    num_views: int = 6
    in_features: int = 128
    out_features: int = 15
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feat, training: bool = False):
        b = feat.shape[0] // self.num_views if feat.ndim == 2 else feat.shape[0]
        feat = feat.reshape(b, self.num_views, self.in_features)
        feat = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                            name="mv_bn")(feat)
        feat = nn.Dropout(self.dropout, deterministic=not training)(feat)
        feat = feat.reshape(b, -1)
        feat = nn.Dense(self.in_features, kernel_init=torch_linear_init,
                        name="fc1")(feat)
        feat = nn.relu(nn.BatchNorm(use_running_average=not training,
                                    momentum=0.9, name="fc_bn")(feat))
        feat = nn.Dropout(self.dropout, deterministic=not training)(feat)
        return nn.Dense(self.out_features, kernel_init=torch_linear_init,
                        name="fc2")(feat)
