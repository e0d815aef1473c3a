"""PointViT: vision transformer over point patches, channels-last.

Parity: openpoints/models/backbone/pointvit.py:16-176 (PointViT with
PointPatchEmbed from openpoints/models/layers/group_embed.py:1-286): FPS
group centers + kNN grouping + mini-PointNet patch embedding, cls token with
learned positional MLPs, pre-norm transformer blocks, cls||max global feature.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import ConvBlock, create_act, torch_linear_init
from ...ops import furthest_point_sample, index_points, knn_point


class TransformerBlock(nn.Module):
    """Pre-norm MHSA + MLP block (parity: openpoints/models/layers/attention.py
    Block)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            use_bias=self.qkv_bias, deterministic=not training,
            dropout_rate=self.drop)(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio),
                     kernel_init=nn.initializers.xavier_uniform())(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, kernel_init=nn.initializers.xavier_uniform())(h)
        return x + h


class PointPatchEmbed(nn.Module):
    """FPS centers + kNN groups + shared-MLP patch embedding
    (parity: group_embed.py PointPatchEmbed, feature_type fj)."""

    num_groups: int = 256
    group_size: int = 32
    embed_dim: int = 384
    in_channels: int = 3

    @nn.compact
    def __call__(self, p, x, training: bool = False):
        idx = furthest_point_sample(p, self.num_groups)
        centers = index_points(p, idx)
        _, nidx = knn_point(self.group_size, p, centers)
        grouped = index_points(x, nidx)  # (B, G, K, C)
        rel = index_points(p, nidx) - centers[:, :, None, :]
        h = jnp.concatenate([rel, grouped], axis=-1)
        h = ConvBlock(128, norm_args={"norm": "ln"}, act_args={"act": "gelu"})(
            h, training)
        h = ConvBlock(256, norm_args={"norm": "ln"}, act_args={"act": "gelu"})(
            h, training)
        h = jnp.max(h, axis=2)  # (B, G, 256)
        h = nn.Dense(self.embed_dim, kernel_init=torch_linear_init)(h)
        return centers, h


@MODELS.register_module()
class PointViT(nn.Module):
    """parity: pointvit.py:16-176."""

    in_channels: int = 3
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    num_groups: int = 256
    group_size: int = 32
    global_feat: str = "cls,max"

    @property
    def out_channels(self) -> int:
        return len(self.global_feat.split(",")) * self.embed_dim

    @nn.compact
    def _encode(self, p, x, training: bool):
        if x is None:
            x = p
        centers, tokens = PointPatchEmbed(
            self.num_groups, self.group_size, self.embed_dim,
            self.in_channels, name="patch_embed")(p, x, training)
        pos = nn.Dense(128, kernel_init=torch_linear_init, name="pos1")(centers)
        pos = nn.gelu(pos)
        pos = nn.Dense(self.embed_dim, kernel_init=torch_linear_init,
                       name="pos2")(pos)
        b = tokens.shape[0]
        cls_token = self.param("cls_token",
                               nn.initializers.normal(0.02),
                               (1, 1, self.embed_dim))
        cls_pos = self.param("cls_pos", nn.initializers.normal(0.02),
                             (1, 1, self.embed_dim))
        tok = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)), tokens], 1)
        pos_all = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (b, 1, self.embed_dim)), pos], 1)
        hx = tok
        for i in range(self.depth):
            # add_pos_each_block=True (pointvit.py:140-142)
            hx = TransformerBlock(self.embed_dim, self.num_heads,
                                  self.mlp_ratio, self.qkv_bias,
                                  self.drop_rate, name=f"block{i}")(
                hx + pos_all, training)
        hx = nn.LayerNorm(epsilon=1e-6)(hx)
        return centers, hx

    def __call__(self, p, x=None, training: bool = False):
        return self.forward_cls_feat(p, x, training)

    def forward_cls_feat(self, p, x=None, training: bool = False):
        _, hx = self._encode(p, x, training)
        tokens = hx[:, 1:, :]
        feats = []
        for t in self.global_feat.split(","):
            if "cls" in t:
                feats.append(hx[:, 0, :])
            elif "max" in t:
                feats.append(jnp.max(tokens, axis=1))
            elif t in ("avg", "mean"):
                feats.append(jnp.mean(tokens, axis=1))
        return jnp.concatenate(feats, axis=-1)

    def forward_seg_feat(self, p, x=None, training: bool = False):
        centers, hx = self._encode(p, x, training)
        return [p, centers], [x, hx[:, 1:, :]]


class KMeansEmbed(nn.Module):
    """K-means cluster centers as group centers, then kNN patch embedding
    (parity: openpoints/models/layers/kmeans.py:8 KMeansEmbed)."""

    num_groups: int = 256
    group_size: int = 32
    embed_dim: int = 384
    in_channels: int = 3
    n_iters: int = 10

    @nn.compact
    def __call__(self, p, x, training: bool = False):
        from ..layers.kmeans import kmeans
        _, centers = kmeans(p, self.num_groups, self.n_iters)
        _, nidx = knn_point(min(self.group_size, p.shape[1]), p, centers)
        grouped = index_points(x, nidx)
        rel = index_points(p, nidx) - centers[:, :, None, :]
        h = jnp.concatenate([rel, grouped], axis=-1)
        h = ConvBlock(128, norm_args={"norm": "ln"}, act_args={"act": "gelu"})(
            h, training)
        h = ConvBlock(256, norm_args={"norm": "ln"}, act_args={"act": "gelu"})(
            h, training)
        h = jnp.max(h, axis=2)
        h = nn.Dense(self.embed_dim, kernel_init=torch_linear_init)(h)
        return centers, h


@MODELS.register_module()
class ViTGraph(nn.Module):
    """Graph ViT for point clouds (parity:
    openpoints/models/backbone/graphvit3d.py:11-134 ViTGraph): group or
    k-means patch embedding, cls token + learned cls pos, per-block
    positional addition, final LayerNorm; forward returns (centers, tokens)
    with the cls token first."""

    in_channels: int = 6
    num_classes: int = 40
    encoder_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    embed_args: Optional[dict] = None
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None

    @property
    def out_channels(self) -> int:
        return self.encoder_dim

    @nn.compact
    def __call__(self, xyz, features=None, training: bool = False):
        emb = dict(self.embed_args or {"NAME": "groupembed",
                                       "num_groups": 256, "group_size": 32,
                                       "embed_dim": 256})
        name = emb.get("NAME", "groupembed").lower()
        cls_embed = (KMeansEmbed if name == "kmeans" else PointPatchEmbed)
        centers, h = cls_embed(
            num_groups=int(emb.get("num_groups", 256)),
            group_size=int(emb.get("group_size", 32)),
            embed_dim=int(emb.get("embed_dim", 256)),
            name="group_embed")(xyz, xyz if features is None else features,
                                training)
        h = nn.Dense(self.encoder_dim, kernel_init=torch_linear_init,
                     name="proj_layer")(h)
        b = h.shape[0]
        cls_token = self.param("cls_token", nn.initializers.normal(0.02),
                               (1, 1, self.encoder_dim))
        cls_pos = self.param("cls_pos", nn.initializers.normal(0.02),
                             (1, 1, self.encoder_dim))
        pos = nn.Dense(128, kernel_init=torch_linear_init, name="pos1")(centers)
        pos = nn.gelu(pos)
        pos = nn.Dense(self.encoder_dim, kernel_init=torch_linear_init,
                       name="pos2")(pos)
        h = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.encoder_dim)), h], 1)
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (b, 1, self.encoder_dim)), pos], 1)
        for i in range(self.depth):
            h = TransformerBlock(self.encoder_dim, self.num_heads,
                                 self.mlp_ratio, name=f"block{i}")(
                h + pos, training)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        return centers, h

    def forward_cls_feat(self, xyz, features=None, training: bool = False):
        _, h = self(xyz, features, training)
        return jnp.concatenate([h[:, 0], jnp.max(h[:, 1:], axis=1)], -1)
