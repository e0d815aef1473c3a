"""RandLA-Net: random downsampling + local feature aggregation with
attentive pooling, channels-last.

Parity: openpoints/models/backbone/randlenet.py:12-290 (SharedMLP,
LocalSpatialEncoding with relative-position encodings, AttentivePooling,
LocalFeatureAggregation residual dilated blocks, encoder/decoder with random
decimation and nearest-neighbor upsampling).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import torch_linear_init
from ...ops import index_points, knn_point


class _SharedMLP(nn.Module):
    channels: int
    act: bool = True
    bn: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.channels, kernel_init=torch_linear_init)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5)(x)
        return nn.leaky_relu(x, negative_slope=0.2) if self.act else x


class LocalSpatialEncoding(nn.Module):
    """Relative-position encoding concat'd with neighbor features
    (parity: randlenet.py:58-106)."""

    d: int
    num_neighbors: int

    @nn.compact
    def __call__(self, coords, features, idx, dist, training: bool = False):
        # coords (B,N,3), features (B,N,d), idx (B,N,K), dist (B,N,K)
        nb = index_points(coords, idx)  # (B,N,K,3)
        center = jnp.broadcast_to(coords[:, :, None, :], nb.shape)
        spatial = jnp.concatenate(
            [center, nb, center - nb, dist[..., None]], axis=-1)  # (B,N,K,10)
        spatial = _SharedMLP(self.d)(spatial, training)
        fj = index_points(features, idx)  # (B,N,K,d)
        return jnp.concatenate([spatial, fj], axis=-1)  # (B,N,K,2d)


class AttentivePooling(nn.Module):
    """Softmax-scored neighbor pooling (parity: randlenet.py:108-138)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        # x (B,N,K,C)
        scores = nn.Dense(x.shape[-1], use_bias=False,
                          kernel_init=torch_linear_init)(x)
        scores = jax.nn.softmax(scores, axis=2)
        pooled = jnp.sum(scores * x, axis=2)  # (B,N,C)
        return _SharedMLP(self.out_channels)(pooled, training)


class LocalFeatureAggregation(nn.Module):
    """Residual dilated block (parity: randlenet.py:140-185)."""

    d_out: int
    num_neighbors: int

    @nn.compact
    def __call__(self, coords, features, training: bool = False):
        k = min(self.num_neighbors, coords.shape[1])
        d2, idx = knn_point(k, coords, coords)
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        x = _SharedMLP(self.d_out // 2)(features, training)
        x = LocalSpatialEncoding(self.d_out // 2, k)(coords, x, idx, dist,
                                                     training)
        x = AttentivePooling(self.d_out // 2)(x, training)
        x = LocalSpatialEncoding(self.d_out // 2, k)(coords, x, idx, dist,
                                                     training)
        x = AttentivePooling(self.d_out)(x, training)
        x = _SharedMLP(2 * self.d_out, act=False)(x, training)
        shortcut = _SharedMLP(2 * self.d_out, act=False)(features, training)
        return nn.leaky_relu(x + shortcut, negative_slope=0.2)


@MODELS.register_module()
class RandLANet(nn.Module):
    """parity: randlenet.py:187-290 (4 LFA stages, decimation 4, nearest
    upsampling decoder). Decimation uses the loader's pre-shuffled point
    order (slicing == random sampling, as in the reference)."""

    d_in: int = 4
    num_classes: int = 13
    num_neighbors: int = 16
    decimation: int = 4
    dims: Sequence[int] = (16, 64, 128, 256)

    @property
    def out_channels(self) -> int:
        return 2 * self.dims[-1]

    @nn.compact
    def _run(self, pos, x, training: bool, decode: bool):
        if x is None:
            x = pos
        h = _SharedMLP(8, name="stem")(x, training)
        coords = pos
        stack = []
        d = self.decimation
        for i, dim in enumerate(self.dims):
            h = LocalFeatureAggregation(dim, self.num_neighbors,
                                        name=f"lfa{i}")(coords, h, training)
            stack.append((coords, h))
            n_keep = max(coords.shape[1] // d, 1)
            coords = coords[:, :n_keep]
            h = h[:, :n_keep]
        h = _SharedMLP(2 * self.dims[-1], name="mid")(h, training)
        if not decode:
            return coords, h
        # decoder: nearest-neighbor upsample + skip MLP (randlenet.py:253-278)
        for i, (up_coords, skip) in enumerate(reversed(stack)):
            _, nn_idx = knn_point(1, coords, up_coords)
            h = index_points(h, nn_idx[..., 0])
            h = _SharedMLP(skip.shape[-1], name=f"dec{i}")(
                jnp.concatenate([h, skip], axis=-1), training)
            coords = up_coords
        return coords, h

    def __call__(self, pos, x=None, training: bool = False):
        return self.forward_seg_feat(pos, x, training)

    def forward_cls_feat(self, pos, x=None, training: bool = False):
        _, h = self._run(pos, x, training, decode=False)
        return jnp.max(h, axis=1)

    def forward_seg_feat(self, pos, x=None, training: bool = False):
        _, h = self._run(pos, x, training, decode=True)
        return pos, h
