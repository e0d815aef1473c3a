"""Point Transformer, fixed-shape batched re-design.

Parity: openpoints/models/backbone/pointtransformer.py:14-293 — vector
self-attention within kNN neighborhoods (query/key diff + positional MLP,
share_planes grouping), TransitionDown (FPS + kNN grouped linear + max),
Bottleneck residual blocks, and the classification encoder.

The reference runs on offset-based variable-length batches via the pointops
CUDA package; XLA needs static shapes, so this uses dense (B, N, C) batching
with the same math — the padded equivalent called out in SURVEY.md §2.3.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import torch_linear_init
from ...ops import furthest_point_sample, index_points, knn_point


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, training: bool = False):
        return nn.BatchNorm(use_running_average=not training, momentum=0.9,
                            epsilon=1e-5)(x)


class PointTransformerLayer(nn.Module):
    """Vector attention over kNN neighborhoods
    (parity: pointtransformer.py:14-52)."""

    out_planes: int
    share_planes: int = 8
    nsample: int = 16

    @nn.compact
    def __call__(self, p, x, training: bool = False):
        # p (B,N,3), x (B,N,C)
        c = self.out_planes
        s = self.share_planes
        xq = nn.Dense(c, kernel_init=torch_linear_init, name="linear_q")(x)
        xk = nn.Dense(c, kernel_init=torch_linear_init, name="linear_k")(x)
        xv = nn.Dense(c, kernel_init=torch_linear_init, name="linear_v")(x)
        _, idx = knn_point(min(self.nsample, p.shape[1]), p, p)
        kj = index_points(xk, idx)  # (B,N,k,C)
        vj = index_points(xv, idx)
        pr = index_points(p, idx) - p[:, :, None, :]  # (B,N,k,3)
        # positional MLP (linear_p): 3 -> 3 (BN,ReLU) -> C
        pr_h = nn.Dense(3, kernel_init=torch_linear_init, name="p1")(pr)
        pr_h = nn.relu(_BN(name="p_bn")(pr_h, training))
        pr_e = nn.Dense(c, kernel_init=torch_linear_init, name="p2")(pr_h)
        # attention logits (linear_w): BN,ReLU -> C/s (BN,ReLU) -> C/s
        k_eff = kj.shape[2]
        pr_sum = pr_e.reshape(*pr_e.shape[:3], 1, c).sum(3)
        w = kj - xq[:, :, None, :] + pr_sum
        w = nn.relu(_BN(name="w_bn1")(w, training))
        w = nn.Dense(c // s, kernel_init=torch_linear_init, name="w1")(w)
        w = nn.relu(_BN(name="w_bn2")(w, training))
        w = nn.Dense(c // s, kernel_init=torch_linear_init, name="w2")(w)
        w = jax.nn.softmax(w, axis=2)  # over neighbors
        b, n = x.shape[:2]
        vpr = (vj + pr_e).reshape(b, n, k_eff, s, c // s)
        out = (vpr * w[:, :, :, None, :]).sum(axis=2).reshape(b, n, c)
        return out


class TransitionDown(nn.Module):
    """FPS downsample + kNN grouped linear + max
    (parity: pointtransformer.py:81-113)."""

    out_planes: int
    stride: int = 1
    nsample: int = 16

    @nn.compact
    def __call__(self, p, x, training: bool = False):
        if self.stride != 1:
            m = p.shape[1] // self.stride
            idx = furthest_point_sample(p, m)
            n_p = index_points(p, idx)
            _, nidx = knn_point(min(self.nsample, p.shape[1]), p, n_p)
            xj = index_points(x, nidx)  # (B,m,k,C)
            pj = index_points(p, nidx) - n_p[:, :, None, :]
            h = jnp.concatenate([pj, xj], axis=-1)
            h = nn.Dense(self.out_planes, use_bias=False,
                         kernel_init=torch_linear_init)(h)
            h = nn.relu(_BN()(h, training))
            return n_p, jnp.max(h, axis=2)
        h = nn.Dense(self.out_planes, use_bias=False,
                     kernel_init=torch_linear_init)(x)
        return p, nn.relu(_BN()(h, training))


class Bottleneck(nn.Module):
    """Residual PT block (parity: pointtransformer.py:130-160)."""

    planes: int
    share_planes: int = 8
    nsample: int = 16

    @nn.compact
    def __call__(self, p, x, training: bool = False):
        identity = x
        h = nn.relu(_BN()(nn.Dense(self.planes, use_bias=False,
                                   kernel_init=torch_linear_init)(x), training))
        h = nn.relu(_BN()(PointTransformerLayer(
            self.planes, self.share_planes, self.nsample)(p, h, training),
            training))
        h = _BN()(nn.Dense(self.planes, use_bias=False,
                           kernel_init=torch_linear_init)(h), training)
        return p, nn.relu(h + identity)


@MODELS.register_module()
class PointTransformerEncoder(nn.Module):
    """5-stage PT encoder (parity: pointtransformer.py:217-293
    PointTransformerCls/Seg encoders; planes [32,64,128,256,512],
    strides [1,4,4,4,4])."""

    in_channels: int = 4
    blocks: Sequence[int] = (2, 3, 4, 6, 3)
    planes: Sequence[int] = (32, 64, 128, 256, 512)
    strides: Sequence[int] = (1, 4, 4, 4, 4)
    share_planes: int = 8
    nsample: Sequence[int] = (8, 16, 16, 16, 16)

    @property
    def out_channels(self) -> int:
        return self.planes[-1]

    @property
    def channel_list(self):
        return list(self.planes)

    @nn.compact
    def _encode(self, p, x, training: bool, return_all: bool):
        if x is None:
            x = p
        ps, fs = [p], [x]
        for i in range(len(self.planes)):
            p, x = TransitionDown(self.planes[i], self.strides[i],
                                  self.nsample[i], name=f"down{i}")(
                p, x, training)
            for j in range(self.blocks[i]):
                p, x = Bottleneck(self.planes[i], self.share_planes,
                                  self.nsample[i], name=f"block{i}_{j}")(
                    p, x, training)
            ps.append(p)
            fs.append(x)
        if return_all:
            return ps, fs
        return p, x

    def __call__(self, p, x=None, training: bool = False):
        return self.forward_seg_feat(p, x, training)

    def forward_cls_feat(self, p, x=None, training: bool = False):
        _, x = self._encode(p, x, training, return_all=False)
        return jnp.mean(x, axis=1)

    def forward_seg_feat(self, p, x=None, training: bool = False):
        return self._encode(p, x, training, return_all=True)


class TransitionUp(nn.Module):
    """Decoder upsampling (parity: pointtransformer.py:111-143).

    Head mode (``head=True``): concat per-cloud mean-pooled summary
    (linear2) to each point then fuse (linear1). Fusion mode: linear1(fine)
    + 3-NN inverse-distance interpolation of linear2(coarse)."""

    in_planes: int
    out_planes: Optional[int] = None
    head: bool = False

    @nn.compact
    def __call__(self, p1, x1, p2=None, x2=None, training: bool = False):
        if self.head:
            g = jnp.mean(x1, axis=1, keepdims=True)
            g = nn.Dense(self.in_planes, kernel_init=torch_linear_init,
                         name="linear2")(g)
            g = nn.relu(g)
            h = jnp.concatenate(
                [x1, jnp.broadcast_to(g, x1.shape[:2] + (self.in_planes,))],
                axis=-1)
            h = nn.Dense(self.in_planes, kernel_init=torch_linear_init,
                         name="linear1")(h)
            return nn.relu(_BN(name="bn1")(h, training))
        from ...ops import three_interpolation
        a = nn.Dense(self.out_planes, kernel_init=torch_linear_init,
                     name="linear1")(x1)
        a = nn.relu(_BN(name="bn1")(a, training))
        b = nn.Dense(self.out_planes, kernel_init=torch_linear_init,
                     name="linear2")(x2)
        b = nn.relu(_BN(name="bn2")(b, training))
        return a + three_interpolation(p1, p2, b)


@MODELS.register_module()
class PTSeg(nn.Module):
    """Point Transformer semantic-segmentation network (parity:
    pointtransformer.py:217-293 PTSeg): 5-stage encoder (strides
    [1,4,4,4,4]) + TransitionUp U-Net decoder with one local-aggregation
    PT block per level, Linear-BN-ReLU-Linear head -> (B,N,num_classes).

    Dense-batched re-formulation of the reference's offset-based variable
    batches (same math; see module docstring)."""

    blocks: Sequence[int] = (2, 3, 4, 6, 3)
    width: int = 32
    nsample: Sequence[int] = (8, 16, 16, 16, 16)
    in_channels: int = 6
    num_classes: int = 13
    dec_local_aggr: bool = True
    share_planes: int = 8
    strides: Sequence[int] = (1, 4, 4, 4, 4)

    @nn.compact
    def __call__(self, p, x=None, training: bool = False):
        if isinstance(p, dict):
            p, x = p["pos"], p.get("x", None)
        if x is None:
            x = p
        planes = [self.width * 2 ** i for i in range(len(self.blocks))]
        ps, xs = [], []
        for i, pl_ in enumerate(planes):
            p, x = TransitionDown(pl_, self.strides[i], self.nsample[i],
                                  name=f"enc{i}_down")(p, x, training)
            for j in range(1, self.blocks[i]):
                p, x = Bottleneck(pl_, self.share_planes, self.nsample[i],
                                  name=f"enc{i}_b{j}")(p, x, training)
            ps.append(p)
            xs.append(x)

        n_lvl = len(planes)
        # dec5 head: global-summary fusion at the deepest level
        x = TransitionUp(planes[-1], head=True, name="dec_head_up")(
            ps[-1], xs[-1], training=training)
        if self.dec_local_aggr:
            _, x = Bottleneck(planes[-1], self.share_planes, self.nsample[-1],
                              name="dec_head_b")(ps[-1], x, training)
        for i in range(n_lvl - 2, -1, -1):
            x = TransitionUp(planes[i + 1], planes[i],
                             name=f"dec{i}_up")(
                ps[i], xs[i], ps[i + 1], x, training=training)
            if self.dec_local_aggr:
                _, x = Bottleneck(planes[i], self.share_planes,
                                  self.nsample[i], name=f"dec{i}_b")(
                    ps[i], x, training)
        h = nn.Dense(planes[0], kernel_init=torch_linear_init,
                     name="cls1")(x)
        h = nn.relu(_BN(name="cls_bn")(h, training))
        return nn.Dense(self.num_classes, kernel_init=torch_linear_init,
                        name="cls2")(h)
