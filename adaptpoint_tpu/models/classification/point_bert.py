"""Point-BERT finetuning transformer.

Parity: openpoints/models/classification/point_bert.py:10-154 (mini-PointNet
group encoder, cls token + learned cls pos, 3-layer pos MLP, ViT blocks,
[cls || max-token] head). The reference registers it as ``PointTransformer``;
we register it as ``PointBERT`` because that name is taken by the
vector-attention backbone (backbone/pointtransformer.py), matching SURVEY.md
§2.5's naming.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import torch_linear_init
from ...ops import furthest_point_sample, index_points, knn_point, ball_query


class GroupEncoder(nn.Module):
    """Mini-PointNet over local groups (parity: point_bert.py:10-40)."""

    encoder_channel: int = 256

    @nn.compact
    def __call__(self, groups, training: bool = False):
        # groups (B, G, K, 3) center-relative
        h = nn.Dense(128, kernel_init=torch_linear_init)(groups)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5)(h)
        h = nn.relu(h)
        h = nn.Dense(256, kernel_init=torch_linear_init)(h)
        g = jnp.max(h, axis=2, keepdims=True)            # (B,G,1,256)
        h = jnp.concatenate([jnp.broadcast_to(g, h.shape), h], -1)
        h = nn.Dense(512, kernel_init=torch_linear_init)(h)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5)(h)
        h = nn.relu(h)
        h = nn.Dense(self.encoder_channel, kernel_init=torch_linear_init)(h)
        return jnp.max(h, axis=2)                        # (B,G,C)


@MODELS.register_module()
class PointBERT(nn.Module):
    """parity: point_bert.py:43-154 PointTransformer (finetune model)."""

    in_channels: int = 3
    num_classes: int = 40
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    encoder_dims: int = 256
    num_groups: int = 256
    group_size: int = 32
    subsample: str = "fps"
    group: str = "knn"
    radius: float = 0.1
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None

    @nn.compact
    def _run(self, pts, training: bool, head: bool):
        from ..backbone.pointvit import TransformerBlock
        b, n, _ = pts.shape
        g = min(self.num_groups, n)
        centers = index_points(pts, furthest_point_sample(pts, g))
        if "ball" in self.group or "query" in self.group:
            idx = ball_query(self.radius, self.group_size, pts, centers)
        else:
            _, idx = knn_point(min(self.group_size, n), pts, centers)
        neighborhood = index_points(pts, idx) - centers[:, :, None, :]
        tok = GroupEncoder(self.encoder_dims, name="encoder")(
            neighborhood, training)
        tok = nn.Dense(self.embed_dim, kernel_init=torch_linear_init,
                       name="reduce_dim")(tok)
        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        cls_pos = self.param("cls_pos", nn.initializers.normal(1.0),
                             (1, 1, self.embed_dim))
        pos = nn.Dense(128, kernel_init=torch_linear_init,
                       name="pos1")(centers)
        pos = nn.gelu(pos)
        pos = nn.Dense(self.embed_dim, kernel_init=torch_linear_init,
                       name="pos2")(pos)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)), tok], 1)
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (b, 1, self.embed_dim)), pos], 1)
        for i in range(self.depth):
            x = TransformerBlock(self.embed_dim, self.num_heads,
                                 name=f"block{i}")(x + pos, training)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        h = jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], -1)
        if not head:
            return h
        h = nn.Dense(256, kernel_init=torch_linear_init, name="head1")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not training)(h)
        return nn.Dense(self.num_classes, kernel_init=torch_linear_init,
                        name="head2")(h)

    def __call__(self, pts, features=None, training: bool = False):
        return self._run(pts[..., :3], training, head=True)

    def forward_cls_feat(self, pts, features=None, training: bool = False):
        return self._run(pts[..., :3], training, head=False)


# Registered-name parity: the reference registers this finetune transformer
# as ``PointTransformer`` (openpoints/models/classification/point_bert.py:43)
# — a different class from the backbone PointTransformerEncoder family.
MODELS.register_module(name="PointTransformer", module=PointBERT)
