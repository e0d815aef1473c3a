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


@LOSS.register_module(name="BCELogits")
class BCELogits:
    """BCE-with-logits against one-hot integer targets (parity:
    loss/build.py:81-92 BCELogits — the reference flattens [N,C,...] to
    channel-last rows then one-hots; our logits are channels-last already)."""

    def __init__(self, **kwargs):
        self.criterion = BCEWithLogitsLoss()

    def __call__(self, logits, targets):
        if logits.ndim > 2:
            logits = logits.reshape(-1, logits.shape[-1])
        targets = targets.reshape(-1)
        onehot = jnn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
        return self.criterion(logits, onehot)


@LOSS.register_module(name="LabelSmoothingCrossEntropy")
class LabelSmoothingCrossEntropy:
    """timm-style NLL with label smoothing (parity: loss/cross_entropy.py:13
    — confidence*nll + smoothing*mean(-logprobs); note the eps/n uniform
    term differs from SmoothCrossEntropy's eps/(n-1) off-class form)."""

    def __init__(self, label_smoothing: float = 0.1, **kwargs):
        self.smoothing = label_smoothing
        self.confidence = 1.0 - label_smoothing

    def __call__(self, logits, labels):
        if logits.ndim > 2:
            logits = logits.reshape(-1, logits.shape[-1])
        labels = labels.reshape(-1)
        logp = jnn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        smooth = -logp.mean(axis=-1)
        return jnp.mean(self.confidence * nll + self.smoothing * smooth)


@LOSS.register_module(name="SoftTargetCrossEntropy")
class SoftTargetCrossEntropy:
    """CE against a soft target distribution (parity:
    loss/cross_entropy.py:31 — used with mixup/cutmix label mixing)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, logits, target):
        logp = jnn.log_softmax(logits, axis=-1)
        return jnp.mean(jnp.sum(-target.astype(logp.dtype) * logp, axis=-1))


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


@LOSS.register_module(name="Poly1FocalLoss")
class Poly1FocalLoss:
    """Poly-1 focal loss (parity: loss/build.py:179-253 — sigmoid focal BCE
    plus the epsilon*(1-pt)^(gamma+1) poly term; labels one-hotted unless
    label_is_onehot). Channels-last: seg labels (B,N) one-hot to (B,N,C)
    matching our (B,N,C) logits (the reference transposes its [N,C,...])."""

    def __init__(self, epsilon: float = 1.0, alpha: float = 0.25,
                 gamma: float = 2.0, reduction: str = "mean", weight=None,
                 pos_weight=None, label_is_onehot: bool = False, **kwargs):
        self.epsilon = epsilon
        self.alpha = alpha
        self.gamma = gamma
        self.reduction = reduction
        self.weight = None if weight is None else jnp.asarray(weight)
        self.pos_weight = None if pos_weight is None else jnp.asarray(pos_weight)
        self.label_is_onehot = label_is_onehot

    def __call__(self, logits, labels):
        num_classes = logits.shape[-1]
        p = jax.nn.sigmoid(logits)
        if not self.label_is_onehot:
            labels = jnn.one_hot(labels, num_classes, dtype=logits.dtype)
        labels = labels.astype(logits.dtype)
        # binary_cross_entropy_with_logits(reduction="none"):
        # -[pw*t*log σ(x) + (1-t)*log(1-σ(x))], log σ(x) = -softplus(-x)
        pw = 1.0 if self.pos_weight is None else self.pos_weight
        ce = (pw * labels * jnn.softplus(-logits) +
              (1 - labels) * jnn.softplus(logits))
        if self.weight is not None:
            ce = ce * self.weight
        pt = labels * p + (1 - labels) * (1 - p)
        fl = ce * (1 - pt) ** self.gamma
        if self.alpha >= 0:
            a_t = self.alpha * labels + (1 - self.alpha) * (1 - labels)
            fl = a_t * fl
        poly1 = fl + self.epsilon * (1 - pt) ** (self.gamma + 1)
        if self.reduction == "mean":
            return poly1.mean()
        if self.reduction == "sum":
            return poly1.sum()
        return poly1


@LOSS.register_module(name="MultiShapeCrossEntropy")
class MultiShapeCrossEntropy:
    """Per-shape-category criterion over MultiSegHead's list of per-category
    logits (parity: loss/build.py:257-269 — the reference Python-loops the
    batch and indexes the head list by each item's shape label; we compute
    every head's per-item loss with a static head loop + vmap and select by
    one-hot, which is jit-compatible and mathematically identical)."""

    def __init__(self, criterion_args, **kwargs):
        self.criterion = build_criterion_from_cfg(criterion_args)

    def __call__(self, logits_all_shapes, points_labels, shape_labels):
        shape_labels = shape_labels.reshape(-1)
        per_head = []
        for logits in logits_all_shapes:
            # vmap over the batch: each item's scalar loss, as if called
            # criterion(logits[i:i+1], labels[i:i+1]) like the reference
            per_head.append(jax.vmap(self.criterion)(logits, points_labels))
        stacked = jnp.stack(per_head, axis=0)          # (H, B)
        sel = jnn.one_hot(shape_labels, stacked.shape[0],
                          dtype=stacked.dtype)          # (B, H)
        return jnp.mean(jnp.sum(sel.T * stacked, axis=0))


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
