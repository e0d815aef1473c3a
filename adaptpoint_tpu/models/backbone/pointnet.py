"""PointNet encoder with input/feature T-Nets, channels-last.

Parity: openpoints/models/backbone/pointnet.py:13-175 (STN3d, STNkd,
PointNetEncoder): shared-MLP 64-64 -> feature transform -> 64-128-1024 ->
global max pool; the input transform rotates only the xyz slice.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import torch_linear_init


class _MLPBN(nn.Module):
    channels: int
    act: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.channels, kernel_init=torch_linear_init)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.relu(x) if self.act else x


class TNet(nn.Module):
    """T-Net predicting a k x k transform, initialized at identity
    (parity: pointnet.py:13-88 STN3d/STNkd)."""

    k: int
    in_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        # x (B, N, C)
        h = _MLPBN(64)(x, training)
        h = _MLPBN(128)(h, training)
        h = _MLPBN(1024)(h, training)
        h = jnp.max(h, axis=1)  # (B, 1024)
        h = _MLPBN(512)(h, training)
        h = _MLPBN(256)(h, training)
        h = nn.Dense(self.k * self.k, kernel_init=nn.initializers.zeros)(h)
        iden = jnp.eye(self.k, dtype=h.dtype).reshape(1, -1)
        return (h + iden).reshape(-1, self.k, self.k)


@MODELS.register_module()
class PointNetEncoder(nn.Module):
    """parity: pointnet.py:89-175."""

    in_channels: int = 3
    input_transform: bool = True
    feature_transform: bool = True
    is_seg: bool = False

    @property
    def out_channels(self) -> int:
        return 1024 + 64 if self.is_seg else 1024

    @nn.compact
    def _encode(self, pos, x, training: bool):
        if x is None:
            x = pos
        if self.input_transform:
            trans = TNet(3, name="stn")(x, training)
            xyz = jnp.einsum("bnc,bcd->bnd", x[..., :3], trans)
            x = jnp.concatenate([xyz, x[..., 3:]], axis=-1) \
                if x.shape[-1] > 3 else xyz
        x = _MLPBN(64)(x, training)
        x = _MLPBN(64)(x, training)
        if self.feature_transform:
            trans_feat = TNet(64, name="fstn")(x, training)
            x = jnp.einsum("bnc,bcd->bnd", x, trans_feat)
        point_feat = x
        x = _MLPBN(64)(x, training)
        x = _MLPBN(128)(x, training)
        x = _MLPBN(1024, act=False)(x, training)
        global_feat = jnp.max(x, axis=1)  # (B, 1024)
        return point_feat, x, global_feat

    def __call__(self, pos, x=None, training: bool = False):
        return self.forward_cls_feat(pos, x, training)

    def forward_cls_feat(self, pos, x=None, training: bool = False):
        _, _, g = self._encode(pos, x, training)
        return g

    def forward_seg_feat(self, pos, x=None, training: bool = False):
        point_feat, _, g = self._encode(pos, x, training)
        n = point_feat.shape[1]
        seg = jnp.concatenate(
            [point_feat, jnp.broadcast_to(g[:, None, :], (g.shape[0], n, g.shape[-1]))],
            axis=-1)
        return pos, seg
