"""2D image ResNet family (used by multi-view point models).

Parity: openpoints/models/backbone/resnet.py:35-341 (BasicBlock, Bottleneck,
ResNet with layers/groups/width_per_group; resnet18/34/50/101/152 and the
resnext/wide variants via cfg). Channels-last NHWC flax; torch pretrained
URLs are not applicable (no egress) — train from scratch or load converted
weights via the checkpoint utilities.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS

_kinit = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _bn(training: bool, name: str):
    return nn.BatchNorm(use_running_average=not training, momentum=0.9,
                        epsilon=1e-5, name=name)


class BasicBlock(nn.Module):
    """parity: resnet.py:35-73."""

    planes: int
    stride: int = 1
    expansion: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        identity = x
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    use_bias=False, kernel_init=_kinit, name="conv1")(x)
        h = _bn(training, "bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), use_bias=False, kernel_init=_kinit,
                    name="conv2")(h)
        h = _bn(training, "bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=_kinit, name="down_conv")(x)
            identity = _bn(training, "down_bn")(identity)
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    """parity: resnet.py:75-122 (1x1 -> 3x3(groups) -> 1x1 x4)."""

    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    expansion: int = 4

    @nn.compact
    def __call__(self, x, training: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        identity = x
        h = nn.Conv(width, (1, 1), use_bias=False, kernel_init=_kinit,
                    name="conv1")(x)
        h = nn.relu(_bn(training, "bn1")(h))
        h = nn.Conv(width, (3, 3), strides=(self.stride,) * 2,
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=_kinit, name="conv2")(h)
        h = nn.relu(_bn(training, "bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, kernel_init=_kinit,
                    name="conv3")(h)
        h = _bn(training, "bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, kernel_init=_kinit,
                               name="down_conv")(x)
            identity = _bn(training, "down_bn")(identity)
        return nn.relu(h + identity)


@MODELS.register_module()
class ResNet(nn.Module):
    """parity: resnet.py:124-247. cfg examples:
    resnet18: block='basic', layers=(2,2,2,2);
    resnet50: block='bottleneck', layers=(3,4,6,3);
    resnext50_32x4d: block='bottleneck', layers=(3,4,6,3), groups=32,
    width_per_group=4; wide_resnet50_2: width_per_group=128."""

    block: str = "basic"
    layers: Sequence[int] = (2, 2, 2, 2)
    in_channels: int = 3
    num_classes: Optional[int] = None
    groups: int = 1
    width_per_group: int = 64
    channels: Sequence[int] = (64, 128, 256, 512)

    @property
    def out_channels(self) -> int:
        exp = 1 if self.block == "basic" else 4
        return self.channels[-1] * exp

    @nn.compact
    def __call__(self, x, training: bool = False):
        # x (B, H, W, C) NHWC
        h = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False,
                    kernel_init=_kinit, name="conv1")(x)
        h = nn.relu(_bn(training, "bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        blk = BasicBlock if self.block == "basic" else Bottleneck
        for i, (planes, n) in enumerate(zip(self.channels, self.layers)):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                if blk is BasicBlock:
                    h = blk(planes, stride, name=f"layer{i}_{j}")(h, training)
                else:
                    h = blk(planes, stride, self.groups, self.width_per_group,
                            name=f"layer{i}_{j}")(h, training)
        h = jnp.mean(h, axis=(1, 2))  # global avg pool
        if self.num_classes:
            h = nn.Dense(self.num_classes, name="fc")(h)
        return h

    def forward_cls_feat(self, x, training: bool = False):
        return self(x, training)
