"""PointMLP encoder, channels-last.

Parity: openpoints/models/backbone/pointmlp.py:150-405 (LocalGrouper with
geometric-affine normalization, PreExtraction residual MLPs over neighbors +
max-pool, PosExtraction residual MLPs per point; PointMLP adds the classifier
head). kNN grouping, anchor/center normalization with a global std, and the
[grouped || center] concat match the reference.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import create_act, torch_linear_init
from ...ops import furthest_point_sample, index_points, knn_point


class _ConvBNAct(nn.Module):
    channels: int
    bias: bool = False
    act: str = "relu"

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.channels, use_bias=self.bias,
                     kernel_init=torch_linear_init)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5)(x)
        return create_act({"act": self.act})(x)


class _ResMLP(nn.Module):
    """ConvBNReLURes1D (parity: pointmlp.py:213-243)."""

    channels: int
    res_expansion: float = 1.0
    bias: bool = False
    act: str = "relu"

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = create_act({"act": self.act})
        h = _ConvBNAct(int(self.channels * self.res_expansion), self.bias,
                       self.act)(x, training)
        h = nn.Dense(self.channels, use_bias=self.bias,
                     kernel_init=torch_linear_init)(h)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5)(h)
        return act(h + x)


class LocalGrouper(nn.Module):
    """FPS + kNN grouping with geometric-affine normalization
    (parity: pointmlp.py:140-196)."""

    channel: int
    sample_ratio: int
    kneighbors: int
    use_xyz: bool = False
    normalize: Optional[str] = "anchor"

    @nn.compact
    def __call__(self, xyz, points, training: bool = False):
        b, n, _ = xyz.shape
        s = n // self.sample_ratio
        fps_idx = furthest_point_sample(xyz, s)
        new_xyz = index_points(xyz, fps_idx)
        new_points = index_points(points, fps_idx)
        _, idx = knn_point(self.kneighbors, xyz, new_xyz)
        grouped_xyz = index_points(xyz, idx)
        grouped_points = index_points(points, idx)
        if self.use_xyz:
            grouped_points = jnp.concatenate([grouped_points, grouped_xyz], -1)
        if self.normalize is not None:
            if self.normalize == "center":
                mean = jnp.mean(grouped_points, axis=2, keepdims=True)
            else:  # anchor
                mean = (jnp.concatenate([new_points, new_xyz], -1)
                        if self.use_xyz else new_points)[:, :, None, :]
            diff = grouped_points - mean
            # per-cloud std over all entries (pointmlp.py:189-190)
            std = jnp.std(diff.reshape(b, -1), axis=-1)[:, None, None, None]
            grouped_points = diff / (std + 1e-5)
            add = 3 if self.use_xyz else 0
            alpha = self.param("affine_alpha", nn.initializers.ones,
                               (1, 1, 1, self.channel + add))
            beta = self.param("affine_beta", nn.initializers.zeros,
                              (1, 1, 1, self.channel + add))
            grouped_points = alpha * grouped_points + beta
        center = jnp.broadcast_to(new_points[:, :, None, :],
                                  new_points.shape[:2] + (self.kneighbors,
                                                          new_points.shape[-1]))
        return new_xyz, jnp.concatenate([grouped_points, center], axis=-1)


@MODELS.register_module()
class PointMLPEncoder(nn.Module):
    """parity: pointmlp.py:293-352."""

    in_channels: int = 3
    embed_dim: int = 64
    res_expansion: float = 1.0
    activation: str = "relu"
    bias: bool = False
    use_xyz: bool = False
    normalize: str = "anchor"
    dim_expansion: Sequence[int] = (2, 2, 2, 2)
    pre_blocks: Sequence[int] = (2, 2, 2, 2)
    pos_blocks: Sequence[int] = (2, 2, 2, 2)
    k_neighbors: Sequence[int] = (24, 24, 24, 24)
    reducers: Sequence[int] = (2, 2, 2, 2)

    @property
    def out_channels(self) -> int:
        c = self.embed_dim
        for e in self.dim_expansion:
            c *= e
        return c

    @nn.compact
    def forward_cls_feat(self, p, x=None, training: bool = False):
        if x is None:
            x = p
        x = _ConvBNAct(self.embed_dim, self.bias, self.activation,
                       name="embedding")(x, training)
        last = self.embed_dim
        for i in range(len(self.pre_blocks)):
            out_ch = last * self.dim_expansion[i]
            p, x = LocalGrouper(last, self.reducers[i], self.k_neighbors[i],
                                self.use_xyz, self.normalize,
                                name=f"grouper{i}")(p, x, training)
            # PreExtraction: transfer + res blocks over (B,S,K,C), pool K
            in_extra = 3 if self.use_xyz else 0
            x = _ConvBNAct(out_ch, self.bias, self.activation,
                           name=f"pre{i}_transfer")(x, training)
            for j in range(self.pre_blocks[i]):
                x = _ResMLP(out_ch, self.res_expansion, self.bias,
                            self.activation, name=f"pre{i}_res{j}")(x, training)
            x = jnp.max(x, axis=2)  # (B,S,C)
            for j in range(self.pos_blocks[i]):
                x = _ResMLP(out_ch, self.res_expansion, self.bias,
                            self.activation, name=f"pos{i}_res{j}")(x, training)
            last = out_ch
        return jnp.max(x, axis=1)

    def __call__(self, p, x=None, training: bool = False):
        return self.forward_cls_feat(p, x, training)


@MODELS.register_module()
class PointMLP(nn.Module):
    """Self-contained classifier: PointMLPEncoder + the original 3-layer
    classifier head (parity: pointmlp.py:353-393 PointMLP — Linear-BN-ReLU-
    Dropout(0.5) x2 then the class projection)."""

    in_channels: int = 3
    num_classes: int = 15
    embed_dim: int = 64
    res_expansion: float = 1.0
    activation: str = "relu"
    bias: bool = False
    use_xyz: bool = False
    normalize: str = "anchor"
    dim_expansion: Sequence[int] = (2, 2, 2, 2)
    pre_blocks: Sequence[int] = (2, 2, 2, 2)
    pos_blocks: Sequence[int] = (2, 2, 2, 2)
    k_neighbors: Sequence[int] = (24, 24, 24, 24)
    reducers: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, p, x=None, training: bool = False):
        feat = PointMLPEncoder(
            self.in_channels, self.embed_dim, self.res_expansion,
            self.activation, self.bias, self.use_xyz, self.normalize,
            self.dim_expansion, self.pre_blocks, self.pos_blocks,
            self.k_neighbors, self.reducers, name="encoder")(p, x, training)
        from ..layers.blocks import LinearBlock, torch_linear_init
        h = LinearBlock(512, norm_args={"norm": "bn1d"},
                        act_args={"act": self.activation},
                        dropout=0.5, name="fc1")(feat, training)
        h = LinearBlock(256, norm_args={"norm": "bn1d"},
                        act_args={"act": self.activation},
                        dropout=0.5, name="fc2")(h, training)
        return nn.Dense(self.num_classes, kernel_init=torch_linear_init,
                        name="cls")(h)

    def forward_cls_feat(self, p, x=None, training: bool = False):
        return self(p, x, training)
