"""Loss registry + functional criteria.

Parity: openpoints/loss/build.py:6-280 (LOSS registry, CrossEntropy,
SmoothCrossEntropy). Criteria are pure functions of (logits, labels) returning
scalar loss — idiomatic for jax.grad.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import nn as jnn

from ..utils.registry import Registry

LOSS = Registry("loss")

__all__ = ["LOSS", "build_criterion_from_cfg", "SmoothCrossEntropy", "CrossEntropy"]


@LOSS.register_module(name="SmoothCrossEntropy")
class SmoothCrossEntropy:
    """Label-smoothed CE (parity: loss/build.py:11-64 SmoothCrossEntropy).

    Smoothed target: (1-eps) on the true class, eps/(n-1) elsewhere.
    """

    def __init__(self, label_smoothing: float = 0.2, ignore_index=None,
                 num_classes=None, weight=None, **kwargs):
        self.label_smoothing = label_smoothing
        self.ignore_index = ignore_index
        self.num_classes = num_classes
        self.weight = None if weight is None else jnp.asarray(weight)

    def per_sample(self, logits, labels):
        """Unreduced per-sample loss (used by RSMix's lambda-mixed loss,
        train_pointwolf_utils.py:150-157)."""
        n_class = logits.shape[-1]
        eps = self.label_smoothing
        one_hot = jnn.one_hot(labels, n_class, dtype=logits.dtype)
        if eps > 0:
            target = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / (n_class - 1)
        else:
            target = one_hot
        logp = jnn.log_softmax(logits, axis=-1)
        per = -(target * logp)
        if self.weight is not None:
            per = per * self.weight
        return per.sum(axis=-1)

    def __call__(self, logits, labels):
        # logits (..., C) channels-last; labels (...) int
        if logits.ndim > 2:
            logits = logits.reshape(-1, logits.shape[-1])
        labels = labels.reshape(-1)
        n_class = logits.shape[-1]
        eps = self.label_smoothing
        valid = None
        if self.ignore_index is not None:
            valid = (labels != self.ignore_index).astype(logits.dtype)
            labels = jnp.where(labels == self.ignore_index, 0, labels)
        one_hot = jnn.one_hot(labels, n_class, dtype=logits.dtype)
        if eps > 0:
            target = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / (n_class - 1)
        else:
            target = one_hot
        logp = jnn.log_softmax(logits, axis=-1)
        per = -(target * logp)
        if self.weight is not None:
            per = per * self.weight
        per = per.sum(axis=-1)
        if valid is not None:
            return (per * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        return per.mean()


@LOSS.register_module(name="CrossEntropy")
@LOSS.register_module(name="CrossEntropyLoss")
class CrossEntropy(SmoothCrossEntropy):
    def __init__(self, label_smoothing: float = 0.0, **kwargs):
        super().__init__(label_smoothing=label_smoothing, **kwargs)


@LOSS.register_module(name="BCEWithLogitsLoss")
class BCEWithLogitsLoss:
    def __call__(self, logits, targets):
        t = targets.astype(logits.dtype)
        return jnp.mean(jnp.maximum(logits, 0) - logits * t +
                        jnp.log1p(jnp.exp(-jnp.abs(logits))))


@LOSS.register_module(name="BCELoss")
class BCELoss:
    """Binary CE on probabilities (parity: torch.nn.BCELoss used as the GAN
    criterion, examples/classification/train_autoaug.py:109)."""

    def __call__(self, probs, targets):
        p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
        t = targets.astype(p.dtype)
        return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


@LOSS.register_module(name="MaskedCrossEntropy")
class MaskedCrossEntropy:
    """CE over masked points (parity: loss/build.py MaskedCrossEntropy)."""

    def __init__(self, label_smoothing: float = 0.2, **kwargs):
        self.ce = SmoothCrossEntropy(label_smoothing=label_smoothing)

    def __call__(self, logits, labels, mask):
        per = self.ce.per_sample(logits.reshape(-1, logits.shape[-1]),
                                 labels.reshape(-1))
        m = mask.reshape(-1).astype(per.dtype)
        return (per * m).sum() / jnp.maximum(m.sum(), 1.0)


@LOSS.register_module(name="FocalLoss")
class FocalLoss:
    """Binary focal loss (parity: loss/build.py FocalLoss)."""

    def __init__(self, gamma: float = 2.0, alpha: float = 0.25, **kwargs):
        self.gamma = gamma
        self.alpha = alpha

    def __call__(self, logits, labels):
        p = jax.nn.sigmoid(logits)
        t = labels.astype(p.dtype)
        ce = -(t * jnp.log(jnp.clip(p, 1e-7)) +
               (1 - t) * jnp.log(jnp.clip(1 - p, 1e-7)))
        p_t = p * t + (1 - p) * (1 - t)
        a_t = self.alpha * t + (1 - self.alpha) * (1 - t)
        return jnp.mean(a_t * (1 - p_t) ** self.gamma * ce)


@LOSS.register_module(name="Poly1CrossEntropyLoss")
class Poly1CrossEntropy:
    """Poly-1 CE (parity: loss/build.py Poly1CrossEntropyLoss)."""

    def __init__(self, epsilon: float = 1.0, label_smoothing: float = 0.0,
                 **kwargs):
        self.eps = epsilon
        self.ce = SmoothCrossEntropy(label_smoothing=label_smoothing)

    def __call__(self, logits, labels):
        labels_f = labels.reshape(-1)
        logits_f = logits.reshape(-1, logits.shape[-1])
        probs = jax.nn.softmax(logits_f, axis=-1)
        pt = jnp.take_along_axis(probs, labels_f[:, None], axis=-1)[:, 0]
        return self.ce(logits_f, labels_f) + self.eps * jnp.mean(1.0 - pt)


@LOSS.register_module(name="DistillLoss")
class DistillLoss:
    """Knowledge-distillation wrapper around a base criterion (parity:
    openpoints/loss/distill_loss.py:14-85). Soft mode: KLDiv of
    temperature-scaled log-softmaxes * tau^2 / numel; hard mode: CE against
    the teacher argmax. ``teacher_fn`` is a jittable callable inputs->logits
    (the caller closes over frozen teacher params — no torch.no_grad needed,
    we just never differentiate through it)."""

    def __init__(self, base_criterion_args, distill_type: str = "hard",
                 alpha: float = 0.5, tau: float = 10.0, **kwargs):
        assert distill_type in ("none", "soft", "hard")
        self.base_criterion = build_criterion_from_cfg(base_criterion_args)
        self.distill_type = distill_type
        self.alpha = alpha
        self.tau = tau

    def __call__(self, inputs, outputs, labels, teacher_fn):
        outputs_kd = None
        if isinstance(outputs, (tuple, list)):
            outputs, outputs_kd = outputs
        base_loss = self.base_criterion(outputs, labels)
        if self.distill_type == "none":
            return base_loss
        if outputs_kd is None:
            outputs_kd = outputs
        teacher_logits = jax.lax.stop_gradient(teacher_fn(inputs))
        if self.distill_type == "soft":
            t = self.tau
            log_p = jnn.log_softmax(outputs_kd / t, axis=1)
            log_q = jnn.log_softmax(teacher_logits / t, axis=1)
            kl = jnp.sum(jnp.exp(log_q) * (log_q - log_p))
            distill = kl * (t * t) / outputs_kd.size
        else:
            hard = jnp.argmax(teacher_logits, axis=1)
            distill = CrossEntropy()(outputs_kd, hard)
        return base_loss * (1.0 - self.alpha) + distill * self.alpha


def build_criterion_from_cfg(cfg, **default_args):
    from ..utils.registry import build_from_cfg
    return build_from_cfg(cfg, LOSS, default_args or None)
