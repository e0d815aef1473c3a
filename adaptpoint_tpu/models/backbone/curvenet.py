"""CurveNet: curve grouping/aggregation over guided walks, channels-last.

Parity: openpoints/models/backbone/curvenet.py:44-795 — LPFA local
aggregation, CIC bottleneck blocks with optional curve grouping (top-k
attention starting points, gumbel-guided walk with momentum descriptor and
crossover suppression, inter/intra curve aggregation), masked max-pool
downsampling, attention-gated FP decoder, SE head. The walk is a
``lax.scan`` over curve_length with explicit gumbel RNG ('curve' stream).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import torch_linear_init
from ...ops import ball_group, furthest_point_sample, index_points, knn_point


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class _ConvBN(nn.Module):
    channels: int
    act: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.channels, use_bias=False,
                     kernel_init=torch_linear_init)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5)(x)
        return _lrelu(x) if self.act else x


class LPFA(nn.Module):
    """Local point-feature aggregation (parity: curvenet.py:347-411)."""

    in_channel: int
    out_channel: int
    k: int
    mlp_num: int = 2
    initial: bool = False

    @nn.compact
    def __call__(self, x, xyz, idx=None, training: bool = False):
        # x (B,N,C) or None when initial; xyz (B,N,3)
        if idx is None:
            _, idx = knn_point(self.k, xyz, xyz)
        nb_xyz = index_points(xyz, idx)  # (B,N,k,3)
        center = jnp.broadcast_to(xyz[:, :, None, :], nb_xyz.shape)
        geo = jnp.concatenate([center, nb_xyz, nb_xyz - center], -1)  # (B,N,k,9)
        if self.initial:
            h = geo
        else:
            nb_f = index_points(x, idx)  # (B,N,k,C)
            df = nb_f - x[:, :, None, :]
            geo_f = _ConvBN(self.in_channel, act=False,
                            name="xyz2feature")(geo, training)
            h = _lrelu(df + geo_f)
        c = self.in_channel
        for i in range(self.mlp_num):
            h = _ConvBN(self.out_channel, name=f"mlp{i}")(h, training)
            c = self.out_channel
        return jnp.max(h, axis=2) if self.initial else jnp.mean(h, axis=2)


class Walk(nn.Module):
    """Guided walk over the kNN graph (parity: curvenet.py:70-186)."""

    in_channel: int
    k: int
    curve_num: int
    curve_length: int

    @nn.compact
    def __call__(self, xyz, x, adj, start, rng, training: bool = False):
        # x (B,N,C); adj (B,N,k); start (B, curve_num) int
        b, n, c = x.shape
        agent = nn.Dense(1, use_bias=False, kernel_init=torch_linear_init,
                         name="agent")
        agent_bn = nn.BatchNorm(use_running_average=not training,
                                momentum=0.9, epsilon=1e-5, name="agent_bn")
        momentum = nn.Dense(2, use_bias=False, kernel_init=torch_linear_init,
                            name="momentum")
        momentum_bn = nn.BatchNorm(use_running_average=not training,
                                   momentum=0.9, epsilon=1e-5,
                                   name="momentum_bn")

        def suppression(cur_vec, nb_vec):
            # cosine damping in [0,1] (curvenet.py:91-106), stop-gradient
            cur_vec = jax.lax.stop_gradient(cur_vec)  # (B,cn,C)
            nb_vec = jax.lax.stop_gradient(nb_vec)  # (B,cn,k,C)
            dot = jnp.einsum("bmc,bmkc->bmk", cur_vec, nb_vec)
            den = jnp.clip(jnp.linalg.norm(cur_vec, axis=-1)[..., None]
                           * jnp.linalg.norm(nb_vec, axis=-1), 1e-8)
            return jnp.clip(1.0 + dot / den, 0.0, 1.0)

        pre = index_points(x, start)  # (B,cn,C) curve descriptor
        cur_feat = pre
        cur = start
        rngs = jax.random.split(rng, self.curve_length)
        curves = []
        for step in range(self.curve_length):
            if step > 0:
                att_in = jnp.concatenate([cur_feat, pre], -1)
                att = jax.nn.softmax(
                    momentum_bn(momentum(att_in)), axis=-1)  # (B,cn,2)
                pre = cur_feat * att[..., 0:1] + pre * att[..., 1:2]
            pick_idx = index_points(adj.astype(jnp.int32), cur)  # (B,cn,k)
            pick_vals = index_points(x, pick_idx)  # (B,cn,k,C)
            h = jnp.concatenate(
                [pick_vals,
                 jnp.broadcast_to(pre[:, :, None, :], pick_vals.shape)], -1)
            logits = agent_bn(agent(h))[..., 0]  # (B,cn,k)
            if step > 0:
                d = suppression(cur_feat - pre,
                                pick_vals - cur_feat[:, :, None, :])
                logits = logits * d
            g = -jnp.log(-jnp.log(
                jax.random.uniform(rngs[step], logits.shape, minval=1e-10)
                + 1e-10))
            soft = jax.nn.softmax(logits + g, axis=-1)  # (B,cn,k)
            cur_feat = jnp.einsum("bmk,bmkc->bmc", soft, pick_vals)
            sel_k = jnp.argmax(soft, axis=-1)  # (B,cn)
            cur = jnp.take_along_axis(pick_idx, sel_k[..., None], -1)[..., 0]
            curves.append(cur_feat)
        return jnp.stack(curves, axis=2)  # (B, cn, cl, C)


class CurveGrouping(nn.Module):
    """Attention start selection + walk (parity: curvenet.py:616-643)."""

    in_channel: int
    k: int
    curve_num: int
    curve_length: int

    @nn.compact
    def __call__(self, x, xyz, adj, training: bool = False):
        att = nn.sigmoid(nn.Dense(1, use_bias=False,
                                  kernel_init=torch_linear_init,
                                  name="att")(x))  # (B,N,1)
        x = x * att
        _, start = jax.lax.top_k(att[..., 0], self.curve_num)  # (B,cn)
        rng = (self.make_rng("curve") if self.has_rng("curve")
               else jax.random.PRNGKey(0))
        return Walk(self.in_channel, self.k, self.curve_num,
                    self.curve_length, name="walk")(
            xyz, x, adj, start.astype(jnp.int32), rng, training)


class CurveAggregation(nn.Module):
    """Inter/intra curve attention fusion (parity: curvenet.py:554-614)."""

    in_channel: int

    @nn.compact
    def __call__(self, x, curves, training: bool = False):
        # x (B,N,C); curves (B,cn,cl,C)
        mid = self.in_channel // 2
        att = nn.Dense(1, use_bias=False, kernel_init=torch_linear_init,
                       name="line_att")(curves)[..., 0]  # (B,cn,cl)
        inter = jnp.einsum("bnl,bnlc->bnc", jax.nn.softmax(att, -1),
                           curves)  # (B,cn,C)
        intra = jnp.einsum("bnl,bnlc->blc",
                           jax.nn.softmax(att, axis=1), curves)  # (B,cl,C)
        inter_a = nn.Dense(mid, use_bias=False, kernel_init=torch_linear_init,
                           name="conva")(inter)
        intra_b = nn.Dense(mid, use_bias=False, kernel_init=torch_linear_init,
                           name="convb")(intra)
        xq = nn.Dense(mid, use_bias=False, kernel_init=torch_linear_init,
                      name="convc")(x)  # (B,N,mid)
        w_inter = jax.nn.softmax(jnp.einsum("bnm,bcm->bnc", xq, inter_a), -1)
        w_intra = jax.nn.softmax(jnp.einsum("bnm,blm->bnl", xq, intra_b), -1)
        inter_v = nn.Dense(mid, use_bias=False, kernel_init=torch_linear_init,
                           name="convn")(inter_a)
        intra_v = nn.Dense(mid, use_bias=False, kernel_init=torch_linear_init,
                           name="convl")(intra_b)
        fused = jnp.concatenate(
            [jnp.einsum("bnc,bcm->bnm", w_inter, inter_v),
             jnp.einsum("bnl,blm->bnm", w_intra, intra_v)], -1)
        fused = _ConvBN(self.in_channel, act=False, name="convd")(fused,
                                                                  training)
        return _lrelu(x + fused)


class CIC(nn.Module):
    """Curve-intervention convolution block (parity: curvenet.py:477-552)."""

    npoint: int
    radius: float
    k: int
    in_channels: int
    output_channels: int
    bottleneck_ratio: int = 2
    mlp_num: int = 2
    curve_config: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, xyz, x, training: bool = False):
        planes = self.in_channels // self.bottleneck_ratio
        if xyz.shape[1] != self.npoint:
            # masked max-pool downsample via the fused ball-group kernel
            idx = furthest_point_sample(xyz, self.npoint)
            new_xyz, _, dpfj, _ = ball_group(self.radius, self.k, xyz, idx, x,
                                             relative=False)
            xyz, x = new_xyz, jnp.max(dpfj[..., 3:], axis=1)
        shortcut = x
        h = _ConvBN(planes, name="conv1")(x, training)
        _, adj = knn_point(self.k + 1, xyz, xyz)
        if self.curve_config is not None:
            curve_num = min(self.curve_config[0], xyz.shape[1])
            curves = CurveGrouping(planes, self.k, curve_num,
                                   self.curve_config[1], name="grouping")(
                h, xyz, adj[:, :, 1:], training)
            h = CurveAggregation(planes, name="aggregation")(h, curves,
                                                             training)
        h = LPFA(planes, planes, self.k, mlp_num=self.mlp_num,
                 name="lpfa")(h, xyz, idx=adj[:, :, :self.k],
                              training=training)
        h = _ConvBN(self.output_channels, act=False, name="conv2")(h, training)
        if self.in_channels != self.output_channels:
            shortcut = _ConvBN(self.output_channels, act=False,
                               name="shortcut")(shortcut, training)
        return xyz, _lrelu(h + shortcut)


class _FPAtt(nn.Module):
    """Attention-gated FP (parity: curvenet.py:316-474)."""

    mlp: Sequence[int]
    att: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, xyz1, xyz2, f1, f2, training: bool = False):
        from ...ops import three_interpolation
        if xyz2.shape[1] == 1:
            interp = jnp.broadcast_to(f2, (f2.shape[0], xyz1.shape[1],
                                           f2.shape[-1]))
        else:
            interp = three_interpolation(xyz1, xyz2, f2)
        if self.att is not None and f1 is not None:
            g = _ConvBN(self.att[2], act=False, name="att_g")(interp, training)
            l = _ConvBN(self.att[2], act=False, name="att_x")(f1, training)
            psi = nn.sigmoid(nn.Dense(1, kernel_init=torch_linear_init,
                                      name="att_psi")(_lrelu(g + l)))
            f1 = f1 * psi
        h = jnp.concatenate([f1, interp], -1) if f1 is not None else interp
        for i, c in enumerate(self.mlp):
            h = _ConvBN(c, name=f"mlp{i}")(h, training)
        return h


CURVE_CONFIG = {"default": [(100, 5), (100, 5), None, None, None]}


@MODELS.register_module()
class CurveNet(nn.Module):
    """Part-segmentation CurveNet (parity: curvenet.py:669-795).

    Stage npoints scale with the input size (reference hard-codes N=2048)."""

    num_classes: int = 50
    category: int = 16
    k: int = 32
    setting: str = "default"

    @nn.compact
    def __call__(self, xyz, x=None, cls0=None, training: bool = False):
        cfg = CURVE_CONFIG[self.setting]
        n = xyz.shape[1]
        b = xyz.shape[0]
        k = self.k

        l0 = LPFA(9, 32, k=k, mlp_num=1, initial=True,
                  name="lpfa0")(None, xyz, training=training)

        def stage(i, npoint, radius, kk, cin, cout, cc, p, f):
            p, f = CIC(npoint, radius, kk, cin, cout, 2,
                       curve_config=cc, name=f"cic{i}1")(p, f, training)
            p, f = CIC(npoint, radius, kk, cout, cout, 4,
                       curve_config=cc, name=f"cic{i}2")(p, f, training)
            return p, f

        p1, f1 = stage(1, n, 0.2, k, 32, 64, cfg[0], xyz, l0)
        p2, f2 = stage(2, n // 4, 0.4, k, 64, 128, cfg[1], p1, f1)
        p3, f3 = stage(3, n // 16, 0.8, k, 128, 256, cfg[2], p2, f2)
        p4, f4 = stage(4, n // 64, 1.2, min(31, n // 64 - 1), 256, 512,
                       cfg[3], p3, f3)
        p5, f5 = stage(5, max(n // 256, 4), 2.0, 7, 512, 1024, cfg[4], p4, f4)

        emb1 = jnp.max(_ConvBN(64, name="gconv1")(f4, training), axis=1)
        emb2 = jnp.max(_ConvBN(128, name="gconv2")(f5, training), axis=1)

        f4u = _FPAtt([512, 512], att=[1024, 512, 256], name="fp4")(
            p4, p5, f4, f5, training)
        p4u, f4u = CIC(p4.shape[1], 1.2, min(31, p4.shape[1] - 1), 512, 512, 4,
                       name="upcic5")(p4, f4u, training)
        f3u = _FPAtt([256, 256], att=[512, 256, 128], name="fp3")(
            p3, p4u, f3, f4u, training)
        p3u, f3u = CIC(p3.shape[1], 0.8, k, 256, 256, 4,
                       name="upcic4")(p3, f3u, training)
        f2u = _FPAtt([128, 128], att=[256, 128, 64], name="fp2")(
            p2, p3u, f2, f3u, training)
        p2u, f2u = CIC(p2.shape[1], 0.4, k, 128, 128, 4,
                       name="upcic3")(p2, f2u, training)
        f1u = _FPAtt([64, 64], att=[128, 64, 32], name="fp1")(
            p1, p2u, f1, f2u, training)

        if cls0 is None:
            onehot = jnp.ones((b, self.category), f1u.dtype)
        else:
            onehot = jax.nn.one_hot(jnp.reshape(cls0, (b,)), self.category,
                                    dtype=f1u.dtype)
        emb = jnp.concatenate([emb1, emb2, onehot], -1)  # (B, 192+cat)
        embn = jnp.broadcast_to(emb[:, None, :], (b, n, emb.shape[-1]))
        h = jnp.concatenate([p1, f1u, embn], -1)
        ph, h = CIC(n, 0.2, k, h.shape[-1], 256, 4, name="upcic2")(
            p1, h, training)
        ph, h = CIC(n, 0.2, k, 256, 256, 4, name="upcic1")(ph, h, training)

        h = _lrelu(nn.BatchNorm(use_running_average=not training,
                                momentum=0.9, epsilon=1e-5, name="bn1")(
            nn.Dense(256, use_bias=False, kernel_init=torch_linear_init,
                     name="conv1")(h)))
        # squeeze-excitation gate (curvenet.py:760-766)
        se = jnp.mean(h, axis=1, keepdims=True)
        se = _ConvBN(256 // 8, name="se1")(se, training)
        se = nn.sigmoid(nn.Dense(256, use_bias=False,
                                 kernel_init=torch_linear_init,
                                 name="se2")(se))
        h = h * se
        h = nn.Dropout(0.5, deterministic=not training)(h)
        return nn.Dense(self.num_classes, kernel_init=torch_linear_init,
                        name="conv2")(h)
