"""GroupPointNet: one FPS sampling + grouping + shared-MLP stack.

Parity: openpoints/models/backbone/grouppointnet.py:11-100 — FPS to
sample_ratio*N centers, kNN/ball grouping of [dp || fj], conv stack over
neighbors, max-pool per group, then max||avg global feature.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import ConvBlock
from ..layers.group_layers import create_grouper
from ...ops import furthest_point_sample, index_points

@MODELS.register_module()
class GroupPointNet(nn.Module):
    in_channels: int = 3
    channels: int = 64
    n_blocks: int = 5
    sample_ratio: float = 0.25
    group_args: Optional[dict] = None
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    conv_args: Optional[dict] = None

    @property
    def out_channels(self) -> int:
        return self.channels * 2

    @nn.compact
    def _forward(self, p, f, training: bool):
        if f is None:
            f = p
        # faithful quirk: the reference default group_args use a 'group'
        # key that create_grouper never reads (it pops 'NAME', defaulting
        # to ballquery; grouppointnet.py:18-21 + group.py:338-352) — so
        # the reference GroupPointNet actually groups by BALL QUERY r=0.1
        group_args = dict(self.group_args or
                          {"radius": 0.1, "nsample": 20})
        group_args.pop("group", None)
        m = int(p.shape[1] * self.sample_ratio)
        idx = furthest_point_sample(p, m)
        p1 = index_points(p, idx)
        grouper = create_grouper(group_args)
        dp, gf = grouper(p1, p, f)  # (B,M,K,3), (B,M,K,C)
        h = jnp.concatenate([dp, gf], axis=-1)
        norm_args = self.norm_args or {"norm": "bn"}
        act_args = self.act_args or {"act": "leakyrelu", "negative_slope": 0.2}
        order = (self.conv_args or {}).get("order", "conv-act-norm")
        for i in range(self.n_blocks - 2):
            h = ConvBlock(self.channels, norm_args=norm_args,
                          act_args=act_args, order=order, bias=False,
                          name=f"conv{i}")(h, training)
        return jnp.max(h, axis=2)  # (B, M, C)

    def __call__(self, p, f=None, training: bool = False):
        return self._forward(p, f, training)

    def forward_cls_feat(self, p, f=None, training: bool = False):
        h = self._forward(p, f, training)
        return jnp.concatenate([jnp.max(h, axis=1), jnp.mean(h, axis=1)], -1)
