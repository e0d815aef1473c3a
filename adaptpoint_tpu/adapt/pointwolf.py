"""Non-learned PointWOLF augmentation (batched, on-device).

Parity: openpoints/online_aug/pointwolf.py:14-179 PointWOLF_classversion —
the random (non-learned) variant used as the discriminator's real-reference
transform and the wpointwolf/wolfmix baselines.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import pointwolf_transform
from ..ops import furthest_point_sample, index_points

__all__ = ["pointwolf", "PointWOLF"]


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def pointwolf(rng, xyz: jnp.ndarray, w_num_anchor: int = 4,
              w_sigma: float = 0.5, w_R_range: float = 10.0,
              w_S_range: float = 3.0, w_T_range: float = 0.25):
    """xyz (B,N,3) -> (xyz, xyz_new)."""
    fps_idx = furthest_point_sample(xyz, w_num_anchor)
    anchors = index_points(xyz, fps_idx)
    new = pointwolf_transform(rng, xyz, anchors, sigma=w_sigma,
                              r_range=w_R_range, s_range=w_S_range,
                              t_range=w_T_range, probs=None)
    return xyz, new


class PointWOLF:
    """Callable wrapper keeping the reference's ctor signature."""

    def __init__(self, w_num_anchor=4, w_sigma=0.5, w_R_range=10,
                 w_S_range=3, w_T_range=0.25, **kwargs):
        self.args = (int(w_num_anchor), float(w_sigma), float(w_R_range),
                     float(w_S_range), float(w_T_range))

    def __call__(self, rng, xyz):
        return pointwolf(rng, xyz, *self.args)
