"""Perception-guidance feedback loss.

Parity: openpoints/function_adaptpoint/ganloss_cls.py:31-65
(get_feedback_loss_ver1): task-model losses on fake vs real batches with the
frozen classifier; the target hardness ratio anneals hardratio_s -> hardratio
over training; loss = |1 - exp(loss_fake - ratio * loss_real)|.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["update_hardratio", "feedback_loss"]


def update_hardratio(start: float, end: float, epoch, total_epoch):
    return start + (end - start) * epoch / total_epoch


def feedback_loss(loss_fake, loss_real, hardratio):
    return jnp.abs(1.0 - jnp.exp(loss_fake - hardratio * loss_real))
