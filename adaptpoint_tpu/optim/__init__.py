"""Optimizer factory (optax).

Parity with the reference timm-derived factory
(openpoints/optim/optim_factory.py:123-306): NAME dispatch over optimizers and
weight-decay filtering that exempts biases and all 1-D params (norm scales)
from decay (add_weight_decay, optim_factory.py:123-135).

The learning rate is injected as a mutable hyperparameter so the epoch
scheduler can update it without rebuilding the optimizer state.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import optax

__all__ = ["build_optimizer_from_cfg", "weight_decay_mask"]


def weight_decay_mask(params) -> Any:
    """True where weight decay applies: only params with ndim >= 2."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def build_optimizer_from_cfg(params, lr: float, NAME: str = "adamw",
                             weight_decay: float = 0.0,
                             momentum: float = 0.9,
                             betas=(0.9, 0.999),
                             eps: float = 1e-8,
                             filter_bias_and_bn: bool = True,
                             grad_norm_clip: Optional[float] = None,
                             **kwargs) -> optax.GradientTransformation:
    name = NAME.lower()
    mask = weight_decay_mask(params) if filter_bias_and_bn else None

    def base(learning_rate):
        if name in ("adamw", "admw"):
            return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                               weight_decay=weight_decay, mask=mask)
        if name == "adam":
            return optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
        if name == "sgd":
            tx = optax.sgd(learning_rate, momentum=momentum, nesterov=kwargs.get("nesterov", False))
            if weight_decay:
                tx = optax.chain(optax.add_decayed_weights(weight_decay, mask=mask), tx)
            return tx
        if name == "lamb":
            return optax.lamb(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                              weight_decay=weight_decay, mask=mask)
        if name == "lars":
            return optax.lars(learning_rate, weight_decay=weight_decay,
                              weight_decay_mask=mask or True, momentum=momentum)
        if name == "radam":
            tx = optax.radam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
            if weight_decay:
                tx = optax.chain(optax.add_decayed_weights(weight_decay, mask=mask), tx)
            return tx
        if name == "adagrad":
            return optax.adagrad(learning_rate)
        if name in ("rmsprop", "rmsproptf", "rmsprop_tf"):
            # rmsprop_tf: eps inside sqrt + centered-uncentered tf semantics
            # (optim_factory.py rmsprop_tf branch)
            return optax.rmsprop(learning_rate, decay=kwargs.get("alpha", 0.9),
                                 momentum=momentum, eps=eps,
                                 eps_in_sqrt=name != "rmsprop")
        if name == "adabelief":
            tx = optax.adabelief(learning_rate, b1=betas[0], b2=betas[1],
                                 eps=eps)
            if weight_decay:
                tx = optax.chain(
                    optax.add_decayed_weights(weight_decay, mask=mask), tx)
            return tx
        if name == "adafactor":
            return optax.adafactor(learning_rate,
                                   weight_decay_rate=weight_decay or None,
                                   weight_decay_mask=mask)
        if name == "nadam":
            tx = optax.nadam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
            if weight_decay:
                tx = optax.chain(
                    optax.add_decayed_weights(weight_decay, mask=mask), tx)
            return tx
        if name == "nadamw":
            return optax.nadamw(learning_rate, b1=betas[0], b2=betas[1],
                                eps=eps, weight_decay=weight_decay, mask=mask)
        if name in ("novograd", "nvnovograd"):
            tx = optax.novograd(learning_rate, b1=betas[0], b2=betas[1],
                                eps=eps, weight_decay=weight_decay)
            return tx
        if name == "lookahead":
            # timm Lookahead wraps an inner optimizer (default adamw)
            inner = optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                                eps=eps, weight_decay=weight_decay, mask=mask)
            return optax.lookahead(inner,
                                   sync_period=int(kwargs.get("k", 6)),
                                   slow_step_size=kwargs.get("alpha", 0.5))
        raise ValueError(f"unsupported optimizer {NAME}")

    tx = optax.inject_hyperparams(base)(learning_rate=lr)
    if grad_norm_clip is not None and grad_norm_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_norm_clip), tx)
    return tx
