"""Correctness tests for the round-4 loss additions, against torch oracles
implementing the exact reference formulas (loss/build.py:81-269,
loss/cross_entropy.py:13-38)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from adaptpoint_tpu.loss import build_criterion_from_cfg
from adaptpoint_tpu.utils.config import EasyConfig


@pytest.fixture
def logits_labels(rng_np):
    logits = rng_np.normal(size=(8, 13)).astype(np.float32)
    labels = rng_np.integers(0, 13, size=8).astype(np.int64)
    return logits, labels


def _build(name, **kw):
    return build_criterion_from_cfg(EasyConfig(dict({"NAME": name}, **kw)))


def test_label_smoothing_ce(logits_labels):
    logits, labels = logits_labels
    ours = float(_build("LabelSmoothingCrossEntropy")(logits, labels))
    x, t = torch.from_numpy(logits), torch.from_numpy(labels)
    logp = F.log_softmax(x, dim=1)
    nll = -logp.gather(1, t.unsqueeze(1)).squeeze(1)
    ref = (0.9 * nll + 0.1 * (-logp.mean(-1))).mean().item()
    assert abs(ours - ref) < 1e-6


def test_soft_target_ce(rng_np):
    logits = rng_np.normal(size=(8, 13)).astype(np.float32)
    target = rng_np.dirichlet(np.ones(13), size=8).astype(np.float32)
    ours = float(_build("SoftTargetCrossEntropy")(logits, target))
    x, t = torch.from_numpy(logits), torch.from_numpy(target)
    ref = torch.sum(-t * F.log_softmax(x, -1), -1).mean().item()
    assert abs(ours - ref) < 1e-6


def test_bce_logits_onehot(logits_labels):
    logits, labels = logits_labels
    ours = float(_build("BCELogits")(logits, labels))
    x, t = torch.from_numpy(logits), torch.from_numpy(labels)
    oh = F.one_hot(t, 13).to(x.dtype)
    ref = F.binary_cross_entropy_with_logits(x, oh).item()
    assert abs(ours - ref) < 1e-6


@pytest.mark.parametrize("pos_weight", [None, 1.7])
def test_poly1_focal(logits_labels, pos_weight):
    logits, labels = logits_labels
    kw = {} if pos_weight is None else {"pos_weight": pos_weight}
    ours = float(_build("Poly1FocalLoss", **kw)(logits, labels))
    x, t = torch.from_numpy(logits), torch.from_numpy(labels)
    lbl = F.one_hot(t, 13).to(x.dtype)
    pw = None if pos_weight is None else torch.full((13,), pos_weight)
    ce = F.binary_cross_entropy_with_logits(x, lbl, reduction="none",
                                            pos_weight=pw)
    p = torch.sigmoid(x)
    pt = lbl * p + (1 - lbl) * (1 - p)
    fl = ce * (1 - pt) ** 2.0
    a_t = 0.25 * lbl + 0.75 * (1 - lbl)
    ref = (a_t * fl + 1.0 * (1 - pt) ** 3.0).mean().item()
    assert abs(ours - ref) < 1e-6


def test_multi_shape_ce_matches_reference_loop(rng_np):
    B, N, H = 6, 32, 4
    parts = [3, 2, 4, 2]
    logits = [rng_np.normal(size=(B, N, p)).astype(np.float32) for p in parts]
    y = rng_np.integers(0, 2, size=(B, N)).astype(np.int64)
    cls = rng_np.integers(0, H, size=(B, 1)).astype(np.int64)
    crit = _build("MultiShapeCrossEntropy",
                  criterion_args={"NAME": "CrossEntropy"})
    ours = float(crit(logits, y, cls))
    # reference: python loop, per-item criterion on the selected head
    inner = _build("CrossEntropy")
    ref = np.mean([float(inner(logits[int(cls[i, 0])][i], y[i]))
                   for i in range(B)])
    assert abs(ours - ref) < 1e-5
