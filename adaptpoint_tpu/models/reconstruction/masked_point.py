"""Masked-autoencoder pretraining for point clouds.

Parity: openpoints/models/reconstruction (maskedpoint.py:12-121 MaskedPoint
with per-sample random masking + Chamfer reconstruction loss;
nodeshuffle.py NodeShuffle upsampling decoder). The RNG is an explicit
'masking' stream instead of torch's global generator.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS, build_model_from_cfg
from ..layers.blocks import torch_linear_init
from ...ops import knn_point, index_points
from ...ops.distances import chamfer_distance


def random_masking(rng, xyz: jnp.ndarray, mask_ratio: float = 0.9):
    """Per-sample random keep subset (parity: maskedpoint.py:41-74)."""
    b, n, _ = xyz.shape
    len_keep = int(n * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (b, n))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = index_points(xyz, ids_keep)
    mask = jnp.ones((b, n))
    mask = mask.at[:, :len_keep].set(0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore, ids_keep


@MODELS.register_module()
class NodeShuffle(nn.Module):
    """EdgeConv + channel-to-points shuffle upsampler
    (parity: reconstruction/nodeshuffle.py)."""

    in_channels: int = 1024
    up_ratio: int = 10
    k: int = 16
    channels: int = 128

    @nn.compact
    def __call__(self, xyz_masked, latent, ids_restore=None,
                 training: bool = False):
        # latent (B, L, C) per-kept-point features
        if latent.ndim == 2:
            latent = jnp.broadcast_to(latent[:, None, :],
                                      (latent.shape[0], xyz_masked.shape[1],
                                       latent.shape[-1]))
        _, idx = knn_point(min(self.k, xyz_masked.shape[1]), xyz_masked,
                           xyz_masked)
        xj = index_points(latent, idx)
        xi = jnp.broadcast_to(latent[:, :, None, :], xj.shape)
        h = jnp.concatenate([xi, xj - xi], axis=-1)
        h = nn.Dense(self.channels, kernel_init=torch_linear_init)(h)
        h = nn.gelu(jnp.max(h, axis=2))  # (B, L, C')
        h = nn.Dense(self.up_ratio * 3, kernel_init=torch_linear_init)(h)
        b, l, _ = h.shape
        offsets = h.reshape(b, l * self.up_ratio, 3)
        base = jnp.repeat(xyz_masked, self.up_ratio, axis=1)
        return base + 0.1 * offsets  # predicted dense cloud (B, L*r, 3)


@MODELS.register_module()
class MaskedPoint(nn.Module):
    """MAE for point-based encoders (parity: maskedpoint.py:12-121)."""

    backbone_args: dict
    decoder_args: dict
    mask_ratio: float = 0.75

    def setup(self):
        self.encoder = build_model_from_cfg(self.backbone_args)
        self.decoder = build_model_from_cfg(self.decoder_args)

    def __call__(self, xyz, features=None, training: bool = True):
        rng = self.make_rng("masking") if training else jax.random.PRNGKey(0)
        xyz_masked, mask, ids_restore, ids_keep = random_masking(
            rng, xyz, self.mask_ratio)
        latent = self.encoder.forward_seg_feat(xyz_masked, xyz_masked,
                                               training)
        if isinstance(latent, tuple):
            latent = latent[1]
        if isinstance(latent, list):
            latent = latent[-1]
        pred = self.decoder(xyz_masked, latent, ids_restore, training)
        d1, d2 = chamfer_distance(pred, xyz)
        loss = jnp.mean(d1) + jnp.mean(d2)
        return loss, pred
