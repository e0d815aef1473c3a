"""SimpleView: multi-view depth-image projection + per-view CNN.

Parity: openpoints/models/backbone/simpleview.py:32-140 (MVModel, MVFC) and
simpleview_util.py (PCViews: 6 views via euler rotations + translation,
points2depth perspective splatting). The depth splat is a segment-sum
scatter (XLA) instead of the reference's scatter_add, numerically EXACT vs
the live reference renderer; the per-view CNN is the same channels-16
ResNet-18-style stack (torch-padding convs, downsample conv+BN). Full
converted-weights logit parity: tests/test_simpleview_parity.py.
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
    """(x, y, z) euler angles (V,3) -> xmat @ ymat @ zmat rotation matrices
    (V,3,3) (parity: simpleview_util.py:8-57 euler2mat — its columns are
    x, y, z in that order)."""
    x, y, z = angles[:, 0], angles[:, 1], angles[:, 2]
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
    """6 canonical views (parity: simpleview_util.py:235-253 PCViews):
    angles (x, y, z) = four x-rotations at z=pi/2 plus the two polar
    y-rotations; rot matrices TRANSPOSED (PCViews.__init__), and the
    translation is SUBTRACTED in point_transform (so z lands positive
    around -TRANS = +1.4)."""
    pi = math.pi
    angles = np.asarray([
        [0 * pi / 2, 0, pi / 2], [1 * pi / 2, 0, pi / 2],
        [2 * pi / 2, 0, pi / 2], [3 * pi / 2, 0, pi / 2],
        [0, -pi / 2, pi / 2], [0, pi / 2, pi / 2]], np.float32)
    rot = np.transpose(_euler2mat(angles), (0, 2, 1)).astype(np.float32)
    trans = np.asarray([[0, 0, _TRANS]] * 6, np.float32)
    return rot, trans


def points2depth(points: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """EXACT depth splat of (BV, N, 3) view-space points -> (BV, H, W, 1)
    (parity: simpleview_util.py:60-172 distribute/points2depth at the
    size_x=size_y=1 the model uses; XLA segment-sum instead of the torch
    scatter_add). Per pixel the reference computes
    sum(depth * w) / sum(w) with w = mask / (depth + 1e-12) — points
    behind the camera (depth < 0) or off-canvas carry zero weight, and
    empty pixels read 0 (weight_scattered zero-fix). Pinned against the
    live reference implementation by
    tests/test_simpleview_parity.py::test_renderer_matches_reference."""
    bv, n, _ = points.shape
    h = w = resolution
    eps = 1e-12
    z = points[..., 2]
    # perspective divide (points2depth:149-156); W/H == 1 at the square
    # resolution but kept for fidelity
    coord_x = points[..., 0] / (z + eps) * (w / h)
    coord_y = points[..., 1] / (z + eps)
    _x = (coord_x + 1.0) * h / 2.0
    _y = (coord_y + 1.0) * w / 2.0
    # size-1 window: extend by linspace(-0.5, -0.5, 1) then ceil
    ex = jnp.ceil(_x - 0.5)
    ey = jnp.ceil(_y - 0.5)
    mask = ((ex >= 0) & (ex <= h - 1) & (ey >= 0) & (ey <= w - 1)
            & (z >= 0))
    # torch % and jnp.mod agree (result takes the divisor's sign); masked
    # entries contribute zero weight so the wrap only bounds the index
    exi = jnp.mod(ex, h).astype(jnp.int32)
    eyi = jnp.mod(ey, w).astype(jnp.int32)
    weight = mask.astype(jnp.float32) / (z + eps)
    weighted_value = z * weight
    flat = exi * w + eyi  # x indexes rows (distribute:117-118)

    def splat(idx, wv, wt):
        ws = jax.ops.segment_sum(wt, idx, num_segments=h * w)
        ws = ws + (ws == 0.0).astype(jnp.float32)
        return jax.ops.segment_sum(wv, idx, num_segments=h * w) / ws

    img = jax.vmap(splat)(flat, weighted_value, weight)
    return img.reshape(bv, h, w, 1)


class _ResBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        identity = x
        # torch conv3x3 padding=1: explicit (1,1) pads — flax 'SAME' pads
        # asymmetrically at stride 2 and picks different pixels
        h = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        h = nn.relu(nn.BatchNorm(use_running_average=not training,
                                 momentum=0.9)(h))
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9)(h)
        if identity.shape != h.shape:
            # resnet downsample = conv1x1 + BN (resnet.py:186-190); the BN
            # was missing here until the round-5 reference-parity pass
            identity = nn.Conv(self.channels, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False)(x)
            identity = nn.BatchNorm(use_running_average=not training,
                                    momentum=0.9)(identity)
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
        # point_transform (simpleview_util.py:280-292): matmul then
        # SUBTRACT the translation
        pts = jnp.einsum("bnc,vcd->bvnd", pos, rot_j) - trans_j[None, :, None, :]
        img = points2depth(pts.reshape(b * v, n, 3), self.resolution)

        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem")(img)
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
