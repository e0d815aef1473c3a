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


def layer_decay_scales(params, decay: float) -> Any:
    """Per-parameter LR multipliers for layer-wise decay (parity: the timm
    layer-decay assigner used by optim_factory.py param_groups_layer_decay).

    Depth is read from ``block<i>`` / ``layer<i>`` / ``blk<i>`` segments in
    the param path; embeddings/stems get the deepest decay, the
    head/classifier gets scale 1.0."""
    import re
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    depths = {}
    max_depth = 0
    for path, _ in flat:
        key = jax.tree_util.keystr(path)
        m = re.search(r"(?:block|layer|blk)s?_?(\d+)", key)
        depths[key] = int(m.group(1)) + 1 if m else None
        if depths[key]:
            max_depth = max(max_depth, depths[key])
    num_layers = max_depth + 1

    def scale_for(key):
        d = depths[key]
        if d is None:
            low = any(t in key for t in ("embed", "stem", "patch", "pos"))
            head = any(t in key for t in ("head", "cls", "fc", "norm'"))
            if low:
                d = 0
            elif head:
                d = num_layers
            else:
                d = num_layers
        return decay ** (num_layers - d)

    leaves = {path: scale_for(jax.tree_util.keystr(path)) for path, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda path, _: leaves[path], params)


def _scale_by_tree(scales) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, s: u * s, updates,
                                      scales), state

    return optax.GradientTransformation(init_fn, update_fn)


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
        if name == "adamp":
            from .adamp import adamp as _adamp
            return _adamp(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=weight_decay,
                          delta=kwargs.get("delta", 0.1),
                          wd_ratio=kwargs.get("wd_ratio", 0.1),
                          nesterov=kwargs.get("nesterov", False))
        if name == "sgdp":
            from .adamp import sgdp as _sgdp
            return _sgdp(learning_rate, momentum=momentum, eps=eps,
                         weight_decay=weight_decay,
                         delta=kwargs.get("delta", 0.1),
                         wd_ratio=kwargs.get("wd_ratio", 0.1),
                         nesterov=kwargs.get("nesterov", False))
        if name == "adahessian":
            from .adahessian import adahessian as _adahessian
            return _adahessian(learning_rate, b1=betas[0], b2=betas[1],
                               eps=eps, weight_decay=weight_decay,
                               hessian_power=kwargs.get("hessian_power", 1.0),
                               mask=mask)
        if name == "lookahead":
            # timm Lookahead wraps an inner optimizer (default adamw)
            inner = optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                                eps=eps, weight_decay=weight_decay, mask=mask)
            return optax.lookahead(inner,
                                   sync_period=int(kwargs.get("k", 6)),
                                   slow_step_size=kwargs.get("alpha", 0.5))
        raise ValueError(f"unsupported optimizer {NAME}")

    tx = optax.inject_hyperparams(base)(learning_rate=lr)
    layer_decay = kwargs.get("layer_decay")
    if layer_decay is not None and 0.0 < float(layer_decay) < 1.0:
        tx = optax.chain(tx, _scale_by_tree(
            layer_decay_scales(params, float(layer_decay))))
    if grad_norm_clip is not None and grad_norm_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_norm_clip), tx)
    if name == "adahessian":
        # second-order path: the train step passes hess_diag= through the
        # whole chain (clip/inject forward extra args)
        tx = optax.with_extra_args_support(tx)
    return tx
