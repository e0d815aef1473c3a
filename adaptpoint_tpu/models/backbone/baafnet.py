"""BAAF-Net: bilateral augmentation + adaptive fusion, channels-last.

Parity: openpoints/models/backbone/baafnet.py:246-527 (BilateralAugmentation,
MixedLocalAggregation, BilateralContextBlock, BAAFNet encoder/decoder with
multi-scale adaptive fusion and built-in classifier). All 1x1 convs /
transposed convs are Dense layers on channels-last tensors (identical math,
MXU-shaped); kNN graphs and FPS run through the dispatching ops layer.
The reference's python FPS starts from a random point (baafnet.py:24-46);
we use the deterministic start-0 FPS shared with the CUDA-parity ops.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import torch_linear_init
from ...ops import furthest_point_sample, index_points, knn_point


class _MLP(nn.Module):
    """Dense + BN + act on the trailing channel axis (parity:
    baafnet.py MLP1d/MLP2d/MLP1dTrans/MLP2dTrans — all kernel-1 convs)."""

    d_out: int
    bn: bool = True
    act: Optional[str] = "relu"
    bias: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.d_out, use_bias=self.bias,
                     kernel_init=torch_linear_init)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5)(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "lrelu":
            x = nn.leaky_relu(x, negative_slope=0.2)
        return x


def _embed_context(x, x_knn):
    """[x_i || x_j - x_i] (parity: baafnet.py:305-309)."""
    x_exp = jnp.broadcast_to(x[:, :, None, :], x_knn.shape)
    return jnp.concatenate([x_exp, x_knn - x_exp], axis=-1)


class BilateralAugmentation(nn.Module):
    """parity: baafnet.py:246-303."""

    d_out: int
    k: int = 16

    @nn.compact
    def __call__(self, p, f, training: bool = False):
        _, knn_idx = knn_point(self.k, p, p)
        f = _MLP(self.d_out // 2, name="mlp0")(f, training)
        p_knn = index_points(p, knn_idx)           # (B,N,k,3)
        f_knn = index_points(f, knn_idx)           # (B,N,k,d/2)
        lgc = _embed_context(p, p_knn)              # (B,N,k,6)
        lsc = _embed_context(f, f_knn)              # (B,N,k,d)
        p_knn_tilde = _MLP(3, name="mlp1")(lsc, training) + p_knn
        lgc_aug = jnp.concatenate([lgc, p_knn_tilde], axis=-1)  # (B,N,k,9)
        f_knn_tilde = _MLP(self.d_out // 2, name="mlp2")(lgc_aug, training) + f_knn
        lsc_aug = jnp.concatenate([lsc, f_knn_tilde], axis=-1)
        alc = jnp.concatenate(
            [_MLP(self.d_out // 2, name="mlp3")(lgc_aug, training),
             _MLP(self.d_out // 2, name="mlp4")(lsc_aug, training)], axis=-1)
        return alc, p_knn_tilde


class MixedLocalAggregation(nn.Module):
    """Softmax-weighted sum || max over k, then 2-layer MLP
    (parity: baafnet.py:311-345)."""

    d: int

    @nn.compact
    def __call__(self, alc, training: bool = False):
        w = _MLP(self.d, bn=False, act=None, name="mlp0")(alc, training)
        w = jax.nn.softmax(w, axis=2)
        pooled = jnp.concatenate(
            [jnp.sum(alc * w, axis=2), jnp.max(alc, axis=2)], axis=-1)
        h = _MLP(self.d, name="mlp1")(pooled, training)
        return _MLP(2 * self.d, act="lrelu", name="mlp2")(h, training)


class BilateralContextBlock(nn.Module):
    """parity: baafnet.py:348-369."""

    d_out: int
    k: int = 16

    @nn.compact
    def __call__(self, p, f, training: bool = False):
        alc, p_knn_tilde = BilateralAugmentation(self.d_out, self.k,
                                                 name="BA")(p, f, training)
        return MixedLocalAggregation(self.d_out,
                                     name="MLA")(alc, training), p_knn_tilde


@MODELS.register_module()
class BAAFNet(nn.Module):
    """parity: baafnet.py:371-527. ``dims[0]`` is the input feature width;
    encoder BCB levels use dims[1:]; the adaptive-fusion decoder runs one
    full upsampling chain per level, softmax-fuses them, and classifies."""

    n_points: int = 4096
    ds_ratio: int = 4
    k: int = 16
    num_classes: int = 13
    dims: Sequence[int] = (4, 8, 16, 64, 128, 256)

    @property
    def out_channels(self) -> int:
        return 2 * self.dims[1]

    @nn.compact
    def __call__(self, p, f=None, training: bool = False):
        if f is None:
            f = p
        dims = list(self.dims[1:])
        n_layers = len(dims) - 1
        f = _MLP(dims[0] * 2, act="lrelu", name="mlp0")(f, training)

        # encoder (baafnet.py:427-475)
        f_enc, us_idx_list, p_knn_tilde_list, p_list = [], [], [], []
        for i in range(n_layers):
            f, p_knn_tilde = BilateralContextBlock(
                dims[i + 1], self.k, name=f"enc{i}")(p, f, training)
            p_knn_tilde_list.append(p_knn_tilde)
            if i == 0:
                f_enc.append(f)
            n_ds = max(p.shape[1] // self.ds_ratio, 1)
            ds_idx = furthest_point_sample(p, n_ds)
            p_ds = index_points(p, ds_idx)
            f = index_points(f, ds_idx)
            f_enc.append(f)
            _, us_idx = knn_point(1, p_ds, p)  # nearest coarse point per fine
            us_idx_list.append(us_idx[..., 0])
            p_list.append(p)
            p = p_ds

        # adaptive-fusion decoder (baafnet.py:481-507)
        f_dec, f_w = [], []
        for n in range(n_layers):
            f = _MLP(f_enc[-1 - n].shape[-1], name=f"dec{n}_mlp")(
                f_enc[-1 - n], training)
            for j in range(n_layers - n):
                f_interp = index_points(f, us_idx_list[-j - n - 1])
                f_cat = jnp.concatenate([f_enc[-j - n - 2], f_interp], axis=-1)
                f = _MLP(2 * dims[-2 - n - j],
                         name=f"dec{n}_recon{j}")(f_cat, training)
            f_dec.append(f)
            f_w.append(_MLP(1, bn=False, act=None,
                            name=f"dec{n}_w")(f, training))
        w = jax.nn.softmax(jnp.concatenate(f_w, axis=-1), axis=-1)
        f = sum(fd * w[..., n:n + 1] for n, fd in enumerate(f_dec))

        # built-in classifier (baafnet.py:406-409)
        h = _MLP(64, name="cls0")(f, training)
        h = _MLP(32, name="cls1")(h, training)
        h = nn.Dropout(0.5, deterministic=not training)(h)
        return _MLP(self.num_classes, bn=False, act=None, name="cls2")(h, training)

    def forward_seg_feat(self, p, f=None, training: bool = False):
        return p, self(p, f, training)
