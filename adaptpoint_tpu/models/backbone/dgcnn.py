"""DGCNN (dynamic graph CNN / EdgeConv), TPU-native channels-last.

Parity with the reference (openpoints/models/backbone/dgcnn.py:12-107 and
openpoints/models/layers/graph_conv.py:38-90): a static EdgeConv head using a
kNN graph on xyz, then ``n_blocks-2`` dynamic EdgeConvs whose kNN graphs are
recomputed in feature space, dense concat of all block outputs, fusion conv,
and a max||avg global pool for classification (out_channels = 2*embed_dim).

EdgeConv's (B,N,K,2C) @ (2C,C') contraction is a single large MXU matmul in
channels-last layout; kNN uses the XLA top_k path (MXU pairwise distances).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import ConvBlock
from ...ops import knn_point, index_points


class EdgeConv(nn.Module):
    """max_K MLP([x_i, x_j - x_i]) (parity: graph_conv.py:38-51 EdgeConv)."""

    out_channels: int
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    conv_args: Optional[dict] = None

    @nn.compact
    def __call__(self, x, idx, training: bool = False):
        # x (B,N,C); idx (B,N,K)
        xj = index_points(x, idx)  # (B,N,K,C)
        xi = jnp.broadcast_to(x[:, :, None, :], xj.shape)
        h = jnp.concatenate([xi, xj - xi], axis=-1)
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        h = ConvBlock(self.out_channels, norm_args=self.norm_args,
                      act_args=self.act_args, order=order)(h, training)
        return jnp.max(h, axis=2)  # (B,N,out)


@MODELS.register_module()
class DGCNN(nn.Module):
    """parity: dgcnn.py:12-107 (defaults: channels 64, embed 1024, 5 blocks,
    k=20, leakyrelu 0.2). graph='ball' gives the BallDGCNN variant
    (openpoints/models/backbone/ball_dgcnn.py:13-60: ball-query edges on xyz
    for every block instead of feature-space kNN)."""

    in_channels: int = 3
    channels: int = 64
    embed_dim: int = 1024
    n_blocks: int = 5
    k: int = 20
    graph: str = "knn"
    radius: float = 0.15
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    conv_args: Optional[dict] = None
    is_seg: bool = False

    @property
    def out_channels(self) -> int:
        return self.embed_dim if self.is_seg else self.embed_dim * 2

    def _block_channels(self):
        out, ch = [self.channels], self.channels
        for _ in range(self.n_blocks - 2):
            out.append(ch)
            ch *= 2
        return out

    @nn.compact
    def _backbone(self, pos, features, training: bool):
        norm_args = self.norm_args or {"norm": "bn"}
        act_args = self.act_args or {"act": "leakyrelu", "negative_slope": 0.2}
        # the reference BallDGCNN defaults to conv-ACT-norm
        # (ball_dgcnn.py:25 conv_args) while DGCNN is conv-norm-act
        conv_args = self.conv_args or (
            {"order": "conv-act-norm"} if self.graph == "ball" else None)
        if features is None:
            features = pos

        def graph(x):
            if self.graph == "ball":
                from ...ops import ball_query
                return ball_query(self.radius, self.k, pos, pos)
            _, idx = knn_point(self.k, x, x)
            return idx

        # head: static graph from xyz (dgcnn.py:50,80)
        idx = graph(pos)
        feats = [EdgeConv(self.channels, norm_args, act_args, conv_args,
                          name="head")(features, idx, training)]
        ch = self.channels
        for i in range(self.n_blocks - 2):
            # dynamic graph recomputed in feature space (graph_conv.py:76-90);
            # ball variant keeps the fixed xyz graph (ball_dgcnn.py:52)
            idx = graph(feats[-1])
            feats.append(EdgeConv(ch, norm_args, act_args, conv_args,
                                  name=f"block{i}")(feats[-1], idx, training))
            ch *= 2
        fused = jnp.concatenate(feats, axis=-1)
        order = (conv_args or {}).get("order", "conv-norm-act")
        fusion = ConvBlock(self.embed_dim, norm_args=norm_args,
                           act_args=act_args, order=order, bias=False,
                           name="fusion")(fused, training)
        return fusion  # (B,N,embed_dim)

    def __call__(self, pos, features=None, training: bool = False):
        return self._backbone(pos, features, training)

    def forward_cls_feat(self, pos, features=None, training: bool = False):
        fusion = self._backbone(pos, features, training)
        return jnp.concatenate(
            [jnp.max(fusion, axis=1), jnp.mean(fusion, axis=1)], axis=-1)

    def forward_seg_feat(self, pos, features=None, training: bool = False):
        return pos, self._backbone(pos, features, training)


@MODELS.register_module()
class BallDGCNN(DGCNN):
    """Registered-name parity with the reference's BallDGCNN
    (openpoints/models/backbone/ball_dgcnn.py:13-60): DGCNN whose edges come
    from ball query on xyz (radius default 0.1) instead of feature-space kNN.
    A reference YAML with ``NAME: BallDGCNN`` builds this directly."""

    graph: str = "ball"
    radius: float = 0.1
