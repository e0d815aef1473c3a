"""PointNet-style spectral-norm discriminator.

Parity: openpoints/models_adaptpoint/point_discriminator.py:16-73
(PointDiscriminator1): one group-all set abstraction with spectral-normalized
pointwise convs [64,128,1024] (no BN, relu), max-pool, spectral-normalized FC
1024->512->256->num_classes with dropout 0.4, and a Linear->sigmoid prob head.
Spectral norm uses flax.linen.SpectralNorm (power iteration state in
'batch_stats', updated when training=True).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .build import ADAPTMODELS
from ..models.layers.blocks import compute_dtype, torch_linear_init


@ADAPTMODELS.register_module()
class PointDiscriminator1(nn.Module):
    num_classes: int = 40
    normal_channel: bool = False

    @nn.compact
    def __call__(self, xyz, training: bool = True):
        # xyz (B, N, 3) -> prob (B, 1). Matmul compute follows the active
        # dtype policy (params and the spectral-norm power iteration stay
        # f32; the (B,N,1024) activation was the dominant D HBM cost in
        # f32); the sigmoid prob is returned in f32 for the BCE.
        dt = compute_dtype()
        x = xyz
        for i, ch in enumerate((64, 128, 1024)):
            x = nn.SpectralNorm(
                nn.Dense(ch, kernel_init=torch_linear_init, dtype=dt,
                         name=f"sa_conv{i}"),
            )(x, update_stats=training)
            x = nn.relu(x)
        x = jnp.max(x, axis=1)  # group-all max pool -> (B, 1024)

        for i, ch in enumerate((512, 256)):
            x = nn.SpectralNorm(
                nn.Dense(ch, kernel_init=torch_linear_init, dtype=dt,
                         name=f"fc{i}"),
            )(x, update_stats=training)
            x = nn.relu(x)
            x = nn.Dropout(0.4, deterministic=not training)(x)
        x = nn.SpectralNorm(
            nn.Dense(self.num_classes, kernel_init=torch_linear_init,
                     dtype=dt, name="fc2"),
        )(x, update_stats=training)
        prob = nn.SpectralNorm(
            nn.Dense(1, kernel_init=torch_linear_init, dtype=dt,
                     name="prob_head"),
        )(x, update_stats=training)
        return nn.sigmoid(prob.astype(jnp.float32))
