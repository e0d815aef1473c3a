"""PointNet++ encoder/decoder (single-scale grouping), channels-last.

Parity: openpoints/models/backbone/pointnetv2.py:149-511 (PointNet2Encoder /
PointNet2Decoder): per-stage SA = FPS downsample + ball-query grouping +
shared MLP chain + max-pool, with a GroupAll final stage when radius is null;
FP decoder via 3-NN interpolation. The mlps/radius/num_samples lists follow
the same config contract.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import CHANNEL_MAP, ConvBlock
from ..layers.group_layers import create_grouper, get_aggregation_features
from ...ops import (ball_group, eval_group_dtype, fps_prefix_idx,
                    furthest_point_sample, index_points, nested_fps_enabled,
                    three_interpolation)
from .pointnext import _aggregation_features_kfirst


class PointNet2SA(nn.Module):
    """One SA stage with an explicit MLP channel chain."""

    channels: Sequence[int]  # conv chain, excluding input size
    stride: int
    radius: Optional[float]
    nsample: Optional[int]
    group_args: Optional[dict] = None
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    conv_args: Optional[dict] = None
    feature_type: str = "dp_fj"
    # input already in FPS selection order -> FPS == arange (nested-FPS
    # identity, ops.fps_prefix_idx)
    input_fps_ordered: bool = False

    @nn.compact
    def __call__(self, p, f, training: bool = False):
        group_args = dict(self.group_args or {"NAME": "ballquery"})
        group_args["radius"] = self.radius
        group_args["nsample"] = self.nsample
        all_aggr = self.radius is None or self.nsample is None
        if all_aggr:
            group_args["radius"] = None
            group_args["nsample"] = None
            new_p = p
        else:
            npoint = max(p.shape[1] // self.stride, 1)
            if self.input_fps_ordered and nested_fps_enabled():
                idx = fps_prefix_idx(p.shape[0], npoint)
                new_p = p[:, :npoint]
            else:
                idx = furthest_point_sample(p, npoint)
                new_p = index_points(p, idx)
        if not all_aggr and group_args.get("NAME", "ballquery") == "ballquery":
            # fused center-gather + ball query + grouping (Pallas on TPU;
            # the XLA fallback is bit-identical to the composite below,
            # which pays a full lax.top_k SORT per stage on TPU — the
            # measured 130 ms -> fused PointNet++ eval at 128x1024).
            # Neighbor-first (B,K,M,3+C) layout; pool over axis 1.
            _, fi, dpfj, _ = ball_group(
                float(self.radius), int(self.nsample), p, idx, f,
                relative=group_args.get("relative_xyz", True),
                normalize_dp=group_args.get("normalize_dp", False),
                out_dtype=eval_group_dtype(training))
            x = _aggregation_features_kfirst(new_p, dpfj, fi,
                                             self.feature_type)
            pool_axis = 1
        else:
            grouper = create_grouper(group_args)
            dp, fj = grouper(new_p, p, f)
            x = get_aggregation_features(new_p, dp, None, fj,
                                         self.feature_type)
            pool_axis = 2
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        for c in self.channels:
            x = ConvBlock(c, norm_args=self.norm_args or {"norm": "bn"},
                          act_args=self.act_args or {"act": "relu"},
                          order=order)(x, training)
        return new_p, jnp.max(x, axis=pool_axis)


@MODELS.register_module()
class PointNet2Encoder(nn.Module):
    """parity: pointnetv2.py:149-345. mlps: per-stage list of per-block conv
    chains (classification uses one block per stage); null radius => GroupAll."""

    in_channels: int = 4
    mlps: Any = None
    radius: Any = (0.2, 0.4, None)
    num_samples: Any = (32, 64, None)
    strides: Sequence[int] = (4, 4, 1)
    width: Optional[int] = None
    layers: int = 3
    aggr_args: Optional[dict] = None
    group_args: Optional[dict] = None
    conv_args: Optional[dict] = None
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    use_res: bool = False
    query_as_support: bool = False
    sampler: str = "fps"

    def _mlps(self) -> List[List[int]]:
        if self.mlps is not None:
            # flatten one-block-per-stage cls form [[chain]] -> chain
            return [list(m[0]) if isinstance(m[0], (list, tuple)) else list(m)
                    for m in self.mlps]
        width = self.width or 64
        out, w = [], width
        for s in self.strides:
            chain = [w] * (self.layers - 1)
            w = w * 2 if s > 1 else w
            chain += [w]
            out.append(chain)
        return out

    @property
    def out_channels(self) -> int:
        return self._mlps()[-1][-1]

    @property
    def channel_list(self) -> List[int]:
        return [m[-1] for m in self._mlps()]

    @nn.compact
    def _encode(self, p0, f0, training: bool, return_all: bool):
        aggr = dict(self.aggr_args or {"feature_type": "dp_fj", "reduction": "max"})
        mlps = self._mlps()
        radius = list(self.radius) if isinstance(self.radius, (list, tuple)) \
            else [self.radius] * len(self.strides)
        nsamples = list(self.num_samples) if isinstance(self.num_samples, (list, tuple)) \
            else [self.num_samples] * len(self.strides)
        if f0 is None:
            f0 = p0
        p, f = p0, f0
        ps, fs = [p0], [f0]
        fps_ordered = False
        for i, chain in enumerate(mlps):
            p, f = PointNet2SA(
                channels=chain, stride=self.strides[i], radius=radius[i],
                nsample=nsamples[i], group_args=self.group_args,
                norm_args=self.norm_args, act_args=self.act_args,
                conv_args=self.conv_args,
                feature_type=aggr.get("feature_type", "dp_fj"),
                input_fps_ordered=fps_ordered,
                name=f"sa{i}")(p, f, training)
            if (radius[i] is not None and nsamples[i] is not None
                    and self.sampler == "fps"):
                fps_ordered = True
            ps.append(p)
            fs.append(f)
        if return_all:
            return ps, fs
        return p, f

    def __call__(self, p0, f0=None, training: bool = False):
        return self.forward_seg_feat(p0, f0, training)

    def forward_cls_feat(self, p0, f0=None, training: bool = False):
        _, f = self._encode(p0, f0, training, return_all=False)
        return f.squeeze(1) if f.shape[1] == 1 else jnp.max(f, axis=1)

    def forward_seg_feat(self, p0, f0=None, training: bool = False):
        return self._encode(p0, f0, training, return_all=True)


@MODELS.register_module()
class PointNet2PartDecoder(nn.Module):
    """FP decoder with shape-class conditioning for part segmentation
    (parity: pointnetv2.py:383-511 PointNet2PartDecoder): FP stages run
    deep->shallow; the shallowest FP receives the 16-dim shape-class one-hot
    concatenated to the stem features (skip_channel_list[0] += 16 at :466,
    one-hot scatter at :503-507)."""

    encoder_channel_list: Sequence[int]
    fp_mlps: Any = None
    in_channels: int = 3
    num_classes: int = 16  # shape categories
    decoder_layers: int = 1

    @property
    def out_channels(self) -> int:
        if self.fp_mlps is not None:
            return self.fp_mlps[0][-1]
        ecl = list(self.encoder_channel_list)
        return max(ecl[0] // 2, 64)

    @nn.compact
    def __call__(self, p, f, cls_label, training: bool = False):
        ecl = list(self.encoder_channel_list)
        f = list(f)
        n = len(ecl)
        B, N = p[0].shape[0], p[0].shape[1]
        # deep stages first (pointnetv2.py:497-501)
        for i in range(-1, -n, -1):
            chain = (self.fp_mlps[i] if self.fp_mlps is not None
                     else [max(ecl[i] // 2, 64)] * (self.decoder_layers + 1))
            interp = three_interpolation(p[i - 1], p[i], f[i])
            x = jnp.concatenate([f[i - 1], interp], axis=-1) \
                if f[i - 1] is not None else interp
            for j, c in enumerate(chain):
                x = ConvBlock(c, norm_args={"norm": "bn"},
                              act_args={"act": "relu"},
                              name=f"fp{n + i}_mlp{j}")(x, training)
            f[i - 1] = x
        # shallowest FP: concat class one-hot to the stem features
        # (pointnetv2.py:503-510)
        one_hot = jax.nn.one_hot(jnp.reshape(cls_label, (B,)),
                                 self.num_classes, dtype=f[-1].dtype)
        cls_feat = jnp.broadcast_to(one_hot[:, None, :],
                                    (B, N, self.num_classes))
        interp = three_interpolation(p[0], p[1], f[1])
        x = jnp.concatenate([cls_feat, f[0], interp], axis=-1)
        chain = (self.fp_mlps[0] if self.fp_mlps is not None
                 else [max(ecl[0] // 2, 64)] * (self.decoder_layers + 1))
        for j, c in enumerate(chain):
            x = ConvBlock(c, norm_args={"norm": "bn"},
                          act_args={"act": "relu"},
                          name=f"fp0_mlp{j}")(x, training)
        return x


@MODELS.register_module()
class PointNet2Decoder(nn.Module):
    """FP decoder (parity: pointnetv2.py:347-382)."""

    encoder_channel_list: Sequence[int]
    fp_mlps: Any = None
    in_channels: int = 3

    @nn.compact
    def __call__(self, p, f, training: bool = False):
        ecl = list(self.encoder_channel_list)
        skip = [self.in_channels] + ecl[:-1]
        f = list(f)
        in_ch = ecl[-1]
        n = len(ecl)
        for i in range(-1, -n - 1, -1):
            interp = three_interpolation(p[i - 1], p[i], f[i])
            x = jnp.concatenate([f[i - 1], interp], axis=-1) \
                if f[i - 1] is not None else interp
            chain = (self.fp_mlps[i] if self.fp_mlps is not None
                     else [max(ecl[i] // 2, 64)] * 2)
            for c in chain:
                x = ConvBlock(c, norm_args={"norm": "bn"},
                              act_args={"act": "relu"})(x, training)
            f[i - 1] = x
            in_ch = chain[-1]
        return f[0]
