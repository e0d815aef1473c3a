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
from ...ops import (furthest_point_sample, index_points, knn_point,
                    three_interpolation)


class Attention(nn.Module):
    """timm-style packed-qkv attention (parity: openpoints/models/layers/
    attention.py:12-38): single qkv Linear (bias only with qkv_bias), scaled
    dot-product over dim//num_heads head channels, output proj Linear WITH
    bias regardless of qkv_bias (the round-1 flax MHA wrapper dropped the
    proj bias whenever qkv_bias=False)."""

    dim: int
    num_heads: int
    qkv_bias: bool = False
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, n, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,N,H,hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        if self.drop > 0:
            attn = nn.Dropout(self.drop, deterministic=not training)(attn)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        out = nn.Dense(self.dim, kernel_init=nn.initializers.xavier_uniform(),
                       name="proj")(out)
        if self.drop > 0:
            out = nn.Dropout(self.drop, deterministic=not training)(out)
        return out


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
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, self.qkv_bias, self.drop,
                      name="attn")(h, training)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio),
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, kernel_init=nn.initializers.xavier_uniform(),
                     name="fc2")(h)
        return x + h


def _embed_norm_act(h, norm: str, act, training: bool):
    """conv-norm-act tail for the patch-embed convs. 'in2d' is torch
    InstanceNorm2d with default affine=False (group_embed.py:77 +
    norm.py:61): paramless per-sample per-channel normalization over the
    (G, K) spatial axes."""
    if norm.startswith("in"):
        mu = jnp.mean(h, axis=(1, 2), keepdims=True)
        var = jnp.var(h, axis=(1, 2), keepdims=True)
        h = (h - mu) * jax.lax.rsqrt(var + 1e-5)
    elif norm.startswith("bn"):
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5)(h)
    elif norm.startswith("ln"):
        h = nn.LayerNorm(epsilon=1e-5)(h)
    else:
        raise ValueError(f"unknown embed norm {norm}")
    return act(h) if act is not None else h


class PointPatchEmbed(nn.Module):
    """Sample centers + group + two-stage shared-MLP patch embedding
    (parity: group_embed.py:59-170 PointPatchEmbed): conv1 half over the
    grouped features (last layer norm/act-free), concat of the K-pooled
    code back onto every neighbor (channel doubling, :138-141), conv2 half
    (last layer norm/act-free, bias=True per create_convblock2d:28-31),
    max-pool over the group. Defaults mirror the reference PointViT
    embed_args (pointvit.py:25-32): knn grouping, feature_type fj, in2d
    norm. ``num_groups=0`` uses the reference's sample_ratio semantics
    (its num_groups kwarg lands in **kwargs and is ignored,
    group_embed.py:65-82)."""

    num_groups: int = 256
    group_size: int = 32
    embed_dim: int = 384
    in_channels: int = 3
    layers: int = 4
    sample_ratio: float = 0.0625
    feature_type: str = "fj"
    norm: str = "in2d"
    # the ViT's gelu act_args never reaches the embed: PointViT builds it
    # from embed_args only, so PointPatchEmbed's own default act (relu,
    # group_embed.py:78) applies
    act: str = "relu"
    group: str = "knn"
    relative_xyz: bool = True
    normalize_dp: bool = False
    radius: float = 0.1

    @nn.compact
    def __call__(self, p, x, training: bool = False):
        from ..layers.blocks import CHANNEL_MAP
        from ...ops import ball_query
        g = self.num_groups or int(p.shape[1] * self.sample_ratio)
        idx = furthest_point_sample(p, g)
        centers = index_points(p, idx)
        if "knn" in self.group:
            _, nidx = knn_point(self.group_size, p, centers)
        else:
            nidx = ball_query(self.radius, self.group_size, p, centers)
        fj = index_points(x, nidx)  # (B, G, K, C)
        if self.feature_type in ("dp", "dp_fj", "dp_df"):
            dp = index_points(p, nidx)
            if self.relative_xyz:
                dp = dp - centers[:, :, None, :]
                if self.normalize_dp:
                    dp = dp / self.radius
            if self.feature_type == "dp":
                h = dp
            elif self.feature_type == "dp_fj":
                h = jnp.concatenate([dp, fj], axis=-1)
            else:  # dp_df
                cx = index_points(x, idx)[:, :, None, :]
                h = jnp.concatenate([dp, fj - cx], axis=-1)
        elif self.feature_type == "df":
            h = fj - index_points(x, idx)[:, :, None, :]
        else:  # fj
            h = fj

        e, L = self.embed_dim, self.layers
        channels = ([CHANNEL_MAP[self.feature_type](self.in_channels)]
                    + [e] * (L // 2) + [e * 2] * (L // 2 - 1) + [e])
        act = create_act({"act": self.act})
        for i in range(L // 2):  # conv1 (last: bare biased Dense)
            last = i == L // 2 - 1
            h = nn.Dense(channels[i + 1], use_bias=last,
                         kernel_init=torch_linear_init)(h)
            if not last:
                h = _embed_norm_act(h, self.norm, act, training)
        pooled = jnp.max(h, axis=2, keepdims=True)
        h = jnp.concatenate(
            [jnp.broadcast_to(pooled, h.shape), h], axis=-1)
        for i in range(L // 2, L):  # conv2 (its input is the doubled concat)
            last = i == L - 1
            h = nn.Dense(channels[i + 1], use_bias=last,
                         kernel_init=torch_linear_init)(h)
            if not last:
                h = _embed_norm_act(h, self.norm, act, training)
        h = jnp.max(h, axis=2)  # (B, G, embed_dim)
        return centers, h


@MODELS.register_module()
class PointViT(nn.Module):
    """parity: pointvit.py:16-176. ``distill=True`` adds a distillation token
    at position 1 (pointvit.py:91-97); forward_cls_feat then returns
    (global_feat, dist_token_feat) in training (pointvit.py:162-166)."""

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
    distill: bool = False

    @property
    def out_channels(self) -> int:
        return len(self.global_feat.split(",")) * self.embed_dim

    @property
    def distill_channels(self) -> int:
        return self.embed_dim

    @property
    def channel_list(self):
        # parity: pointvit.py:87-88 (patch_embed channel list, last = embed)
        return [self.in_channels, self.embed_dim]

    @property
    def n_tokens(self) -> int:
        return 2 if self.distill else 1

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
        toks = [jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)), tokens]
        poss = [jnp.broadcast_to(cls_pos, (b, 1, self.embed_dim)), pos]
        if self.distill:
            dist_token = self.param("dist_token",
                                    nn.initializers.normal(0.02),
                                    (1, 1, self.embed_dim))
            dist_pos = self.param("dist_pos", nn.initializers.normal(0.02),
                                  (1, 1, self.embed_dim))
            toks.insert(1, jnp.broadcast_to(dist_token, (b, 1, self.embed_dim)))
            poss.insert(1, jnp.broadcast_to(dist_pos, (b, 1, self.embed_dim)))
        tok = jnp.concatenate(toks, 1)
        pos_all = jnp.concatenate(poss, 1)
        hx = tok
        for i in range(self.depth):
            # add_pos_each_block=True (pointvit.py:140-142)
            hx = TransformerBlock(self.embed_dim, self.num_heads,
                                  self.mlp_ratio, self.qkv_bias,
                                  self.drop_rate, name=f"block{i}")(
                hx + pos_all, training)
        hx = nn.LayerNorm(epsilon=1e-6, name="norm")(hx)
        return centers, hx

    def __call__(self, p, x=None, training: bool = False):
        return self.forward_cls_feat(p, x, training)

    def forward_cls_feat(self, p, x=None, training: bool = False):
        _, hx = self._encode(p, x, training)
        tokens = hx[:, self.n_tokens:, :]
        feats = []
        for t in self.global_feat.split(","):
            if "cls" in t:
                feats.append(hx[:, 0, :])
            elif "max" in t:
                feats.append(jnp.max(tokens, axis=1))
            elif t in ("avg", "mean"):
                feats.append(jnp.mean(tokens, axis=1))
        global_feat = jnp.concatenate(feats, axis=-1)
        if self.distill and training:
            return global_feat, hx[:, 1, :]
        return global_feat

    def forward_seg_feat(self, p, x=None, training: bool = False):
        # full token sequence (incl. cls token) — the ViT decoders strip it
        # (parity: pointvit.py:170-174 forward_seg_feat / decoder :248-250)
        centers, hx = self._encode(p, x, training)
        return [p, centers], [x, hx]


class _ViTFP(nn.Module):
    """One ViT decoder FP stage (parity: pointvit.py:225-232 _make_dec)."""

    fp_channels: int
    decoder_layers: int = 2

    @nn.compact
    def __call__(self, p1, f1, p2, f2, training: bool = False):
        interp = three_interpolation(p1, p2, f2)
        h = jnp.concatenate([f1, interp], axis=-1) if f1 is not None else interp
        for j in range(self.decoder_layers):
            h = ConvBlock(self.fp_channels, norm_args={"norm": "bn1d"},
                          act_args={"act": "relu"}, name=f"mlp{j}")(h, training)
        return h


def _vit_fp_channels(encoder_channel_list, n_decoder_stages, channel_scaling):
    fp_channels = [encoder_channel_list[-1] * channel_scaling]
    for _ in range(n_decoder_stages - 1):
        fp_channels.insert(0, fp_channels[0] * channel_scaling)
    return fp_channels


def _vit_insert_levels(p, f, n_decoder_stages, scale, sampler):
    """Insert intermediate FPS/random-downsampled levels between the input
    cloud and the patch centers (parity: pointvit.py:242-247)."""
    p, f = list(p), list(f)
    if len(p) != n_decoder_stages + 1:
        for _ in range(n_decoder_stages - 1):
            m = p[0].shape[1] // scale
            if sampler.lower() == "fps":
                idx = furthest_point_sample(p[0], m)
                p.insert(1, index_points(p[0], idx))
            else:  # 'random': strided subsample (stateless stand-in for
                # the reference's torch-RNG random_sample)
                p.insert(1, p[0][:, ::scale][:, :m])
            f.insert(1, None)
    return p, f


def _vit_global_concat(f_out, cls_token, global_feat):
    """[global tokens || f_out] concat (parity: pointvit.py:255-266)."""
    if global_feat is None:
        return f_out
    feats = []
    for t in global_feat.split(","):
        if "cls" in t:
            feats.append(cls_token)
        elif "max" in t:
            feats.append(jnp.max(f_out, axis=1, keepdims=True))
        elif t in ("avg", "mean"):
            feats.append(jnp.mean(f_out, axis=1, keepdims=True))
    g = jnp.concatenate(feats, axis=-1)
    g = jnp.broadcast_to(g, (f_out.shape[0], f_out.shape[1], g.shape[-1]))
    return jnp.concatenate([g, f_out], axis=-1)


@MODELS.register_module()
class PointViTDecoder(nn.Module):
    """FP decoder from patch centers back to the input cloud
    (parity: pointvit.py:177-267 PointViTDecoder)."""

    encoder_channel_list: Sequence[int]
    decoder_layers: int = 2
    n_decoder_stages: int = 2
    scale: int = 4
    channel_scaling: int = 1
    sampler: str = "fps"
    global_feat: Optional[str] = None
    progressive_input: bool = False

    @property
    def out_channels(self) -> int:
        n_global = len(self.global_feat.split(",")) if self.global_feat else 0
        fp = _vit_fp_channels(list(self.encoder_channel_list),
                              self.n_decoder_stages, self.channel_scaling)
        return fp[0] * (n_global + 1)

    @nn.compact
    def __call__(self, p, f, training: bool = False):
        n = self.n_decoder_stages
        fp_channels = _vit_fp_channels(list(self.encoder_channel_list),
                                       n, self.channel_scaling)
        p, f = _vit_insert_levels(p, f, n, self.scale, self.sampler)
        cls_token = f[-1][:, 0:1, :]
        f[-1] = f[-1][:, 1:, :]
        for i in range(-1, -n - 1, -1):
            f[i - 1] = _ViTFP(fp_channels[i], self.decoder_layers,
                              name=f"fp{n + i}")(
                p[i - 1], f[i - 1], p[i], f[i], training)
        return _vit_global_concat(f[-n - 1], cls_token, self.global_feat)


@MODELS.register_module()
class PointViTPartDecoder(nn.Module):
    """Part-seg ViT decoder with shape-class conditioning
    (parity: pointvit.py:270-392 PointViTPartDecoder)."""

    encoder_channel_list: Sequence[int]
    decoder_layers: int = 2
    n_decoder_stages: int = 2
    scale: int = 4
    channel_scaling: int = 1
    sampler: str = "fps"
    global_feat: Optional[str] = None
    progressive_input: bool = False
    cls_map: str = "pointnet2"
    num_classes: int = 16
    act_args: Optional[dict] = None

    @property
    def out_channels(self) -> int:
        n_global = len(self.global_feat.split(",")) if self.global_feat else 0
        fp = _vit_fp_channels(list(self.encoder_channel_list),
                              self.n_decoder_stages, self.channel_scaling)
        return fp[0] * (n_global + 1)

    @nn.compact
    def __call__(self, p, f, cls_label, training: bool = False):
        n = self.n_decoder_stages
        fp_channels = _vit_fp_channels(list(self.encoder_channel_list),
                                       n, self.channel_scaling)
        p, f = _vit_insert_levels(p, f, n, self.scale, self.sampler)
        cls_token = f[-1][:, 0:1, :]
        f[-1] = f[-1][:, 1:, :]
        B, N = p[0].shape[0], p[0].shape[1]
        one_hot = jax.nn.one_hot(jnp.reshape(cls_label, (B,)),
                                 self.num_classes, dtype=f[-1].dtype)
        cls_feat = None
        if self.cls_map == "pointnet2":
            # one-hot -> 64-wide conv (pointvit.py:330-333, 366-369)
            cls_feat = ConvBlock(64, norm_args=None,
                                 act_args=self.act_args or {"act": "relu"},
                                 name="convc")(
                jnp.broadcast_to(one_hot[:, None, :],
                                 (B, N, self.num_classes)), training)
        for i in range(-1, -n, -1):
            f[i - 1] = _ViTFP(fp_channels[i], self.decoder_layers,
                              name=f"fp{n + i}")(
                p[i - 1], f[i - 1], p[i], f[i], training)
        i = -n  # shallowest stage gets the class features (pointvit.py:376-378)
        f1 = f[i - 1]
        if cls_feat is not None:
            f1 = cls_feat if f1 is None else jnp.concatenate(
                [cls_feat, f1], axis=-1)
        f[i - 1] = _ViTFP(fp_channels[i], self.decoder_layers, name="fp0")(
            p[i - 1], f1, p[i], f[i], training)
        return _vit_global_concat(f[-n - 1], cls_token, self.global_feat)


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


# Registered-name parity: the reference registers PointPatchEmbed as a MODELS
# entry (group_embed.py:58); ours is defined above and used by PointViT.
MODELS.register_module(name="PointPatchEmbed", module=PointPatchEmbed)


@MODELS.register_module()
class P3Embed(nn.Module):
    """Progressive point patch embedding (parity: group_embed.py:175-286
    P3Embed): log_scale(1/sample_ratio) stages of {FPS downsample by scale,
    ball/kNN grouping, aggregation features, conv1, concat pooled group
    summary, conv2, max-pool}. Returns (positions list, features list) —
    channel_list mirrors the reference for decoder wiring."""

    sample_ratio: float = 0.0625
    scale: int = 4
    group_size: int = 32
    in_channels: int = 3
    layers: int = 4
    embed_dim: int = 256
    group: str = "ballquery"
    radius: float = 0.1
    feature_type: str = "dp_df"
    reduction: str = "max"

    @property
    def stages(self) -> int:
        import math
        return int(math.log(1.0 / self.sample_ratio, self.scale))

    @property
    def channel_list(self):
        dims = [self.in_channels]
        d = int(self.embed_dim // 2 ** (self.stages - 1))
        for _ in range(self.stages):
            dims.append(d)
            d *= 2
        return dims

    @property
    def out_channels(self) -> int:
        return self.channel_list[-1]

    @nn.compact
    def __call__(self, p, f=None, training: bool = False):
        from ...ops import ball_query
        if f is None:
            f = p
        pool = (lambda t: jnp.mean(t, axis=2, keepdims=True)) \
            if self.reduction in ("mean", "avg", "meanpool", "avgpool") \
            else (lambda t: jnp.max(t, axis=2, keepdims=True))
        out_p, out_f = [p], [f]
        n = p.shape[1]
        dim = int(self.embed_dim // 2 ** (self.stages - 1))
        for s in range(self.stages):
            cur_p, cur_f = out_p[-1], out_f[-1]
            n = n // self.scale
            idx = furthest_point_sample(cur_p, n)
            center_p = index_points(cur_p, idx)
            center_f = index_points(cur_f, idx)
            if "ball" in self.group or "query" in self.group:
                nidx = ball_query(self.radius, self.group_size, cur_p,
                                  center_p)
            else:
                _, nidx = knn_point(self.group_size, cur_p, center_p)
            dp = index_points(cur_p, nidx) - center_p[:, :, None, :]
            fj = index_points(cur_f, nidx)  # (B, G, K, C)
            if self.feature_type == "dp_df":
                h = jnp.concatenate([dp, fj - center_f[:, :, None, :]], -1)
            elif self.feature_type == "dp_fj":
                h = jnp.concatenate([dp, fj], -1)
            else:
                h = jnp.concatenate(
                    [dp, fj, fj - center_f[:, :, None, :]], -1)
            half = self.layers // 2
            for i in range(half):
                last = i == half - 1
                h = ConvBlock(dim, norm_args=None if last else {"norm": "bn"},
                              act_args=None if last else {"act": "relu"},
                              name=f"s{s}_conv1_{i}")(h, training)
            g = pool(h)
            h = jnp.concatenate(
                [jnp.broadcast_to(g, h.shape[:2] + (self.group_size,
                                                    g.shape[-1])), h], -1)
            chain = [dim * 2] * (half - 1) + [dim]
            for i, c in enumerate(chain):
                h = ConvBlock(c, norm_args={"norm": "bn"},
                              act_args={"act": "relu"},
                              name=f"s{s}_conv2_{i}")(h, training)
            out_f.append(pool(h)[:, :, 0, :])
            out_p.append(center_p)
            dim *= 2
        return out_p, out_f
