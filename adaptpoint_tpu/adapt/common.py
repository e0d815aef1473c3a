"""Shared anchor-local deformation math for PointWOLF and the AdaptPoint
augmentor — pure JAX functions with explicit RNG.

Behavioral parity with the reference implementations
(openpoints/online_aug/pointwolf.py:14-179 PointWOLF_classversion and
openpoints/models_adaptpoint/generator_component4_15.py:204-327): random
axis-subset selection, per-anchor R/S/T with per-transform Bernoulli dropout,
Euler-angle rotation composition, Gaussian kernel regression over a random
projection axis, and unit-sphere renormalization.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["random_axis", "apply_local_transform", "kernel_regression",
           "normalize_cloud", "pointwolf_transform"]


def random_axis(rng, batch: int, n_axis: int) -> jnp.ndarray:
    """Random non-empty axis subset as 0/1 bits (B, n_axis, 3)
    (parity: pointwolf.py:152-163 get_random_axis; 1..7 bit patterns)."""
    code = jax.random.randint(rng, (batch, n_axis), 1, 8)
    bits = (code[..., None] >> jnp.arange(3)) & 1
    return bits.astype(jnp.float32)


def _rotation_matrix(degree: jnp.ndarray) -> jnp.ndarray:
    """Euler-angle rotation (B, M, 3) -> (B, M, 3, 3), ZYX composition
    (parity: pointwolf.py:131-141)."""
    s, c = jnp.sin(degree), jnp.cos(degree)
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    row0 = jnp.stack([cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx], -1)
    row1 = jnp.stack([sz * cy, sz * sy * sx + cz * cy, sz * sy * cx - cz * sx], -1)
    row2 = jnp.stack([-sy, cy * sx, cy * cx], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def apply_local_transform(pos_normalize: jnp.ndarray, degree: jnp.ndarray,
                          scale: jnp.ndarray, trl: jnp.ndarray) -> jnp.ndarray:
    """pos (B,M,N,3) @ R @ diag(scale) + trl (parity: pointwolf.py:142-145)."""
    R = _rotation_matrix(degree)  # (B,M,3,3)
    out = jnp.einsum("bmnc,bmcd->bmnd", pos_normalize, R)
    out = out * scale[:, :, None, :]
    return out + trl[:, :, None, :]


def _randomize_transform(rng, degree, scale_raw, trl, axis_rng=None,
                         drop_rng=None):
    """Apply per-transform Bernoulli dropout + random-axis masking
    (parity: pointwolf.py:113-130 local_transformaton randomization).

    degree/scale_raw/trl: (B, M, 3) pre-dropout values; scale_raw in
    [1, S_range]. Returns masked (degree, scale, trl).
    """
    b, m, _ = degree.shape
    r_drop, r_axis = jax.random.split(rng)
    # three dropout bits per anchor: R, S, T (uniform-prob bernoulli == p 0.5)
    drop = jax.random.bernoulli(r_drop, 0.5, (b, m, 3)).astype(jnp.float32)
    axis = random_axis(r_axis, b, m)  # (B, M, 3)
    degree = degree * drop[:, :, 0:1]
    scale = scale_raw * drop[:, :, 1:2] * axis
    scale = scale + (scale == 0).astype(scale.dtype)  # zeros -> 1 (no scaling)
    trl = trl * drop[:, :, 2:3] * axis
    return degree, scale, trl


def kernel_regression(rng, pos: jnp.ndarray, pos_anchor: jnp.ndarray,
                      pos_transformed: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian-kernel blend of the M per-anchor transformed copies along a
    random projection axis (parity: pointwolf.py:85-111 kernel_regression).

    pos (B,N,3), pos_anchor (B,M,3), pos_transformed (B,M,N,3) -> (B,N,3).
    """
    b = pos.shape[0]
    sub = pos_anchor[:, :, None, :] - pos[:, None, :, :]  # (B,M,N,3)
    proj = random_axis(rng, b, 1)  # (B,1,3)
    sub = sub * proj[:, :, None, :]
    d2 = jnp.sum(sub ** 2, axis=-1)  # (B,M,N)
    weight = jnp.exp(-0.5 * d2 / (sigma ** 2))
    num = jnp.sum(weight[..., None] * pos_transformed, axis=1)  # (B,N,3)
    den = jnp.sum(weight, axis=1)[..., None]  # (B,N,1)
    return num / den


def normalize_cloud(pos: jnp.ndarray) -> jnp.ndarray:
    """Center + scale into the unit sphere (parity: pointwolf.py:165-179)."""
    pos = pos - pos.mean(axis=-2, keepdims=True)
    scale = 1.0 / jnp.sqrt((pos ** 2).sum(axis=-1)).max(axis=-1) * 0.999999
    return pos * scale[:, None, None]


def pointwolf_transform(rng, xyz: jnp.ndarray, anchors: jnp.ndarray,
                        *, sigma: float, r_range: float, s_range: float,
                        t_range: float,
                        probs: jnp.ndarray = None) -> jnp.ndarray:
    """Full PointWOLF pipeline from anchors: canonicalize -> per-anchor R/S/T
    (random, or squashed from ``probs`` logits for the learned augmentor)
    -> kernel regression -> unit-sphere normalization.

    xyz (B,N,3); anchors (B,M,3); probs None (random PointWOLF,
    pointwolf.py:27-58) or (B,M,9) logits (AdaptPoint imitator,
    generator_component4_15.py:236-297: tanh/sigmoid squashing, ranges
    R +-r_range deg, S in [1, s_range], T +-t_range).
    """
    b, n, _ = xyz.shape
    m = anchors.shape[1]
    r_vals, r_rand, r_kr = jax.random.split(rng, 3)

    if probs is None:
        k1, k2, k3 = jax.random.split(r_vals, 3)
        degree = jnp.pi * jax.random.uniform(k1, (b, m, 3), minval=-r_range,
                                             maxval=r_range) / 180.0
        scale_raw = jax.random.uniform(k2, (b, m, 3), minval=1.0, maxval=s_range)
        trl = jax.random.uniform(k3, (b, m, 3), minval=-t_range, maxval=t_range)
    else:
        degree = jnp.pi * jnp.tanh(probs[:, :, 0:3]) * r_range / 180.0
        scale_raw = jax.nn.sigmoid(probs[:, :, 3:6]) * (s_range - 1.0) + 1.0
        trl = jnp.tanh(probs[:, :, 6:9]) * t_range

    degree, scale, trl = _randomize_transform(r_rand, degree, scale_raw, trl)
    pos_normalize = xyz[:, None, :, :] - anchors[:, :, None, :]  # (B,M,N,3)
    transformed = apply_local_transform(pos_normalize, degree, scale, trl)
    transformed = transformed + anchors[:, :, None, :]
    new = kernel_regression(r_kr, xyz, anchors, transformed, sigma)
    return normalize_cloud(new)
