"""DeepGCN: residual/dense dynamic graph convolutions with dilated kNN.

Parity: openpoints/models/backbone/deepgcn.py:12-150 and
openpoints/models/layers/graph_conv.py:57-140 (ResDynBlock, DenseDynBlock,
DilatedKNN). Dilation takes every d-th neighbor of a k*d kNN query
(openpoints/models/layers/group.py:31-73 DenseDilated/DilatedKNN).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import ConvBlock
from .dgcnn import EdgeConv
from ...ops import knn_point


def dilated_knn(x, k: int, dilation: int = 1):
    """kNN over k*dilation neighbors, strided by dilation
    (parity: group.py:57-73 DilatedKNN, deterministic path)."""
    _, idx = knn_point(k * dilation, x, x)
    return idx[:, :, ::dilation]


@MODELS.register_module()
class DeepGCN(nn.Module):
    """parity: deepgcn.py:12-150 (defaults: res blocks, 64 channels,
    n_blocks 14, k 16, dilation growing per block)."""

    in_channels: int = 3
    channels: int = 64
    emb_dims: int = 1024
    n_blocks: int = 14
    k: int = 16
    use_dilation: bool = True
    block: str = "res"
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    conv_args: Optional[dict] = None
    is_seg: bool = False

    @property
    def out_channels(self) -> int:
        return self.emb_dims if self.is_seg else self.emb_dims * 2

    @nn.compact
    def _backbone(self, pos, features, training: bool):
        """Round-5 reference-parity fixes: (a) the fusion block consumes
        the CONCAT of the head + every block output in res/plain mode too
        (deepcgn forward:123-127, fusion_dims:76-80), not just the last
        block; (b) block dilation is 1+i UNCAPPED (res path :70-75);
        (c) graph-conv act defaults to relu (deepgcn.py:26) — only the
        fusion block is leakyrelu(0.2) (:89-92)."""
        norm_args = self.norm_args or {"norm": "bn"}
        act_args = self.act_args or {"act": "relu"}
        if features is None:
            features = pos
        idx = dilated_knn(pos, self.k, 1)
        x = EdgeConv(self.channels, norm_args, act_args, self.conv_args,
                     name="head")(features, idx, training)
        feats = [x]
        for i in range(self.n_blocks - 1):
            d = (i + 1) if self.use_dilation and self.block != "plain" else 1
            idx = dilated_knn(feats[-1], self.k, d)
            if self.block == "res":
                h = EdgeConv(self.channels, norm_args, act_args,
                             self.conv_args, name=f"block{i}")(
                    feats[-1], idx, training)
                feats.append(h + feats[-1])
            elif self.block == "dense":
                h = EdgeConv(self.channels, norm_args, act_args,
                             self.conv_args, name=f"block{i}")(
                    feats[-1], idx, training)
                feats.append(jnp.concatenate([feats[-1], h], axis=-1))
            else:  # plain: no residual, no dilation
                feats.append(EdgeConv(self.channels, norm_args, act_args,
                                      self.conv_args, name=f"block{i}")(
                    feats[-1], idx, training))
        fused = jnp.concatenate(feats, axis=-1)
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        return ConvBlock(self.emb_dims, norm_args=norm_args,
                         act_args={"act": "leakyrelu",
                                   "negative_slope": 0.2},
                         order=order, bias=False,
                         name="fusion")(fused, training)

    def __call__(self, pos, features=None, training: bool = False):
        return self._backbone(pos, features, training)

    def forward_cls_feat(self, pos, features=None, training: bool = False):
        fusion = self._backbone(pos, features, training)
        return jnp.concatenate(
            [jnp.max(fusion, axis=1), jnp.mean(fusion, axis=1)], axis=-1)

    def forward_seg_feat(self, pos, features=None, training: bool = False):
        return pos, self._backbone(pos, features, training)
