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
class FoldingNet(nn.Module):
    """Coarse-then-fold decoder from a single global feature
    (parity: base_recontruct.py:102-168 FoldingNet): folding1 predicts
    ``num_coarse`` seed points from the global code; folding2 deforms a 2-D
    grid patch around each coarse point into ``num_fine`` points."""

    in_channels: int = 1024
    emb_dims: int = 1024
    num_fine: int = 1024
    grid_size: int = 2

    @property
    def num_coarse(self) -> int:
        return self.num_fine // self.grid_size ** 2

    @nn.compact
    def __call__(self, xyz, x, training: bool = False):
        B = x.shape[0]
        g2 = self.grid_size ** 2
        # folding1: global code -> coarse skeleton (base_recontruct.py:119-124)
        h = nn.Dense(self.emb_dims, kernel_init=torch_linear_init)(x)
        h = nn.relu(h)
        h = nn.Dense(self.emb_dims, kernel_init=torch_linear_init)(h)
        h = nn.relu(h)
        coarse = nn.Dense(self.num_coarse * 3,
                          kernel_init=torch_linear_init)(h)
        coarse = coarse.reshape(B, self.num_coarse, 3)
        # 2-D folding seed grid in [-0.05, 0.05]^2 (base_recontruct.py:134-136)
        a = jnp.linspace(-0.05, 0.05, self.grid_size)
        seed = jnp.stack(jnp.meshgrid(a, a, indexing="xy"), axis=-1)
        seed = seed.reshape(1, 1, g2, 2)
        seed = jnp.broadcast_to(seed, (B, self.num_coarse, g2, 2))
        seed = seed.reshape(B, self.num_fine, 2)
        center = jnp.repeat(coarse, g2, axis=1)  # (B, num_fine, 3)
        code = jnp.broadcast_to(x[:, None, :],
                                (B, self.num_fine, x.shape[-1]))
        feat = jnp.concatenate([code, seed, center], axis=-1)
        # folding2 (base_recontruct.py:127-132)
        h = nn.Dense(512, kernel_init=torch_linear_init)(feat)
        h = nn.relu(h)
        h = nn.Dense(512, kernel_init=torch_linear_init)(h)
        h = nn.relu(h)
        fine = nn.Dense(3, kernel_init=torch_linear_init)(h) + center
        return coarse, fine


@MODELS.register_module()
class MaskedTransformerDecoder(nn.Module):
    """MAE transformer decoder with mask tokens
    (parity: reconstruction/maskedpointvit.py:14-90 MaskedTransformerDecoder):
    embeds visible tokens, appends learned mask tokens at masked group
    positions, adds positional MLPs of group centers, runs transformer blocks,
    predicts group_size*3 coordinates per group."""

    embed_dim: int
    group_size: int = 32
    decoder_embed_dim: int = 192
    decoder_depth: int = 4
    decoder_num_heads: int = 16

    @nn.compact
    def __call__(self, centers_vis, centers_masked, latent_vis,
                 training: bool = False):
        from ..backbone.pointvit import TransformerBlock
        b, g_vis, _ = latent_vis.shape
        g_mask = centers_masked.shape[1]
        h = nn.Dense(self.decoder_embed_dim,
                     kernel_init=torch_linear_init, name="decoder_embed")(
            latent_vis)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, self.decoder_embed_dim))
        tokens = jnp.concatenate(
            [h, jnp.broadcast_to(mask_token,
                                 (b, g_mask, self.decoder_embed_dim))], 1)
        centers = jnp.concatenate([centers_vis, centers_masked], 1)
        pos = nn.Dense(128, kernel_init=torch_linear_init, name="pos1")(centers)
        pos = nn.gelu(pos)
        pos = nn.Dense(self.decoder_embed_dim, kernel_init=torch_linear_init,
                       name="pos2")(pos)
        for i in range(self.decoder_depth):
            tokens = TransformerBlock(self.decoder_embed_dim,
                                      self.decoder_num_heads,
                                      name=f"block{i}")(tokens + pos, training)
        tokens = nn.LayerNorm(epsilon=1e-6)(tokens)
        pred = nn.Dense(self.group_size * 3, kernel_init=torch_linear_init,
                        name="decoder_pred")(tokens[:, g_vis:])
        # masked-group local patches, re-centered at their group centers
        return (pred.reshape(b, g_mask, self.group_size, 3)
                + centers_masked[:, :, None, :])


@MODELS.register_module()
class MaskedPointViT(nn.Module):
    """MAE over point groups with a ViT encoder
    (parity: reconstruction/maskedpointvit.py MaskedPointViT): FPS groups,
    mask whole groups, encode visible groups with PointViT-style patch
    embedding + blocks, decode masked group patches, chamfer loss against the
    original cloud."""

    num_groups: int = 64
    group_size: int = 32
    embed_dim: int = 128
    depth: int = 4
    num_heads: int = 4
    mask_ratio: float = 0.6
    decoder_args: Optional[dict] = None

    @nn.compact
    def __call__(self, xyz, features=None, training: bool = True):
        from ..backbone.pointvit import PointPatchEmbed, TransformerBlock
        from ...ops import furthest_point_sample, index_points

        rng = self.make_rng("masking") if training else jax.random.PRNGKey(0)
        centers, tokens = PointPatchEmbed(
            self.num_groups, self.group_size, self.embed_dim, 3,
            name="patch_embed")(xyz, xyz if features is None else features,
                                training)
        # group-level random masking
        c_vis, mask, ids_restore, ids_keep = random_masking(
            rng, centers, self.mask_ratio)
        g_vis = c_vis.shape[1]
        tok_vis = index_points(tokens, ids_keep)
        pos = nn.Dense(128, kernel_init=torch_linear_init, name="pos1")(c_vis)
        pos = nn.gelu(pos)
        pos = nn.Dense(self.embed_dim, kernel_init=torch_linear_init,
                       name="pos2")(pos)
        h = tok_vis
        for i in range(self.depth):
            h = TransformerBlock(self.embed_dim, self.num_heads,
                                 name=f"block{i}")(h + pos, training)
        h = nn.LayerNorm(epsilon=1e-6)(h)

        # masked group ids: stable-sort puts kept (0) first, masked (1) last
        all_ids = jnp.argsort(mask, axis=1)
        ids_masked = all_ids[:, g_vis:]
        c_masked = index_points(centers, ids_masked)

        dec_args = dict(self.decoder_args or {})
        dec_args.setdefault("NAME", "MaskedTransformerDecoder")
        dec_args.setdefault("embed_dim", self.embed_dim)
        dec_args.setdefault("group_size", self.group_size)
        pred = build_model_from_cfg(dec_args)(c_vis, c_masked, h, training)
        pred_cloud = pred.reshape(pred.shape[0], -1, 3)
        d1, d2 = chamfer_distance(pred_cloud, xyz)
        loss = jnp.mean(d1) + jnp.mean(d2)
        return loss, pred_cloud


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


@MODELS.register_module()
class MaskedPointGroup(nn.Module):
    """MAE over grouped local patches for point-based encoders
    (parity: reconstruction/maskedpointgroup.py:14-168 MaskedPointGroup):
    FPS/random centers, knn/ball patches in ABSOLUTE coordinates, per-sample
    random group masking, patch-wise encoding of visible groups, transformer
    decoder with mask tokens restoring all groups, per-patch Chamfer-L1
    against the original patches (reference forward_loss 'option 2')."""

    encoder_args: dict
    decoder_args: Optional[dict] = None
    mask_ratio: float = 0.75
    subsample: str = "fps"
    group: str = "knn"
    group_size: int = 32
    sample_ratio: float = 0.25
    radius: float = 0.1

    @nn.compact
    def __call__(self, xyz, features=None, training: bool = True):
        from ..backbone.pointvit import TransformerBlock
        from ..layers.group_layers import KNNGroup, QueryAndGroup
        from ...ops import furthest_point_sample, random_sample

        rng = self.make_rng("masking") if training else jax.random.PRNGKey(0)
        b, n, _ = xyz.shape
        L = int(n * self.sample_ratio)
        if self.subsample == "fps":
            idx = furthest_point_sample(xyz, L)
        else:
            idx = random_sample(rng, xyz, L)
        centers = index_points(xyz, idx)  # (B, L, 3)
        if "knn" in self.group:
            grouper = KNNGroup(self.group_size, relative_xyz=False)
        else:
            grouper = QueryAndGroup(self.radius, self.group_size,
                                    relative_xyz=False)
        feats = xyz if features is None else features
        dp, gf = grouper(centers, xyz, feats)  # (B,L,K,3), (B,L,K,C)

        # group-level masking (maskedpointgroup.py:72-106)
        len_keep = int(L * (1 - self.mask_ratio))
        noise = jax.random.uniform(rng, (b, L))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        dp_vis = jnp.take_along_axis(dp, ids_keep[:, :, None, None], axis=1)
        gf_vis = jnp.take_along_axis(gf, ids_keep[:, :, None, None], axis=1)
        c_vis = jnp.take_along_axis(centers, ids_keep[:, :, None], axis=1)

        # per-patch encoding of [dp || gf] -> one token per visible group
        # (TPU-native stand-in for the reference's encoder.ssl_forward on the
        # patch tensor: shared MLP + max pool, the PointNet patch embed)
        enc = dict(self.encoder_args)
        width = enc.get("embed_dim", enc.get("width", 256))
        h = jnp.concatenate([dp_vis, gf_vis], axis=-1)
        h = nn.Dense(width, kernel_init=torch_linear_init, name="patch0")(h)
        h = nn.gelu(h)
        h = nn.Dense(width, kernel_init=torch_linear_init, name="patch1")(h)
        tokens = jnp.max(h, axis=2)  # (B, len_keep, width)
        pos = nn.gelu(nn.Dense(128, kernel_init=torch_linear_init,
                               name="pos1")(c_vis))
        pos = nn.Dense(width, kernel_init=torch_linear_init, name="pos2")(pos)
        for i in range(enc.get("depth", 4)):
            tokens = TransformerBlock(width, enc.get("num_heads", 4),
                                      name=f"encblock{i}")(tokens + pos,
                                                           training)
        tokens = nn.LayerNorm(epsilon=1e-6, name="encnorm")(tokens)

        # decoder: mask tokens + restore order + transformer over ALL groups
        dec = dict(self.decoder_args or {})
        dwidth = dec.get("embed_dim", 192)
        h = nn.Dense(dwidth, kernel_init=torch_linear_init,
                     name="dec_embed")(tokens)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, dwidth))
        h = jnp.concatenate(
            [h, jnp.broadcast_to(mask_token, (b, L - len_keep, dwidth))], 1)
        h = jnp.take_along_axis(h, ids_restore[:, :, None], axis=1)  # (B,L,D)
        dpos = nn.gelu(nn.Dense(128, kernel_init=torch_linear_init,
                                name="dpos1")(centers))
        dpos = nn.Dense(dwidth, kernel_init=torch_linear_init,
                        name="dpos2")(dpos)
        for i in range(dec.get("depth", 4)):
            h = TransformerBlock(dwidth, dec.get("num_heads", 4),
                                 name=f"decblock{i}")(h + dpos, training)
        h = nn.LayerNorm(epsilon=1e-6, name="decnorm")(h)
        pred = nn.Dense(self.group_size * 3, kernel_init=torch_linear_init,
                        name="dec_pred")(h)
        pred = pred.reshape(b, L, self.group_size, 3)

        # per-patch Chamfer-L1 over all groups (maskedpointgroup.py:110-130)
        d1, d2 = chamfer_distance(pred.reshape(b * L, self.group_size, 3),
                                  dp.reshape(b * L, self.group_size, 3))
        loss = 0.5 * (jnp.mean(jnp.sqrt(d1 + 1e-12))
                      + jnp.mean(jnp.sqrt(d2 + 1e-12)))
        return loss, pred.reshape(b, -1, 3)
