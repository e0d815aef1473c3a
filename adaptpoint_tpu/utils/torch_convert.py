"""Convert reference (torch OpenPoints/AdaptPoint) checkpoints to our format.

A reference user's main portable artifact is a trained ``.pth`` state_dict
(reference layout: ``openpoints/models/backbone/pointnext.py`` builds
``encoder.encoder.{stage}.{block}`` Sequentials of
``convs.{j}.0`` (Conv1d/Conv2d, bias only when no norm follows) +
``convs.{j}.1`` (BatchNorm) + ``skipconv.0``; the cls head is
``prediction.head.{2k}.0`` Linear + ``.1`` BatchNorm1d with dropout in the
odd slots — ``openpoints/models/classification/cls.py``). This module maps
that layout onto our flax ``{"params", "batch_stats"}`` variables:

- Conv1d ``(out, in, 1)`` / Conv2d ``(out, in, 1, 1)`` / Linear ``(out, in)``
  kernels are pointwise over channels in every SA/head position, so each
  maps to our channels-last ``Dense`` kernel by squeezing the trailing
  singleton spatial dims and transposing to ``(in, out)``.
- BatchNorm ``weight/bias`` -> params ``scale/bias``;
  ``running_mean/running_var`` -> batch_stats ``mean/var``
  (same eval-mode formula and eps=1e-5 in torch and flax);
  ``num_batches_tracked`` is dropped (momentum bookkeeping only).
- Our head ``LinearBlock`` Dense layers declare a bias the reference's
  bias-free ``Linear(..., bias=False)`` heads do not have; those are
  ZERO-filled, which is arithmetically identical (the zero bias adds
  nothing and the following BatchNorm is unchanged).

Scope: the flagship PointNeXt-S classification family (single-SA-block
stages). Deeper variants (InvResMLP blocks, ``encoder.encoder.{s}.{b>0}``)
and seg decoders are rejected with an explicit unhandled-key list rather
than silently partially converted.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = ["convert_reference_state_dict", "ConversionReport"]

_STAGE = re.compile(r"^encoder\.encoder\.(\d+)\.(\d+)\.(.+)$")
_CONV = re.compile(r"^convs\.(\d+)\.([01])\.(.+)$")
_SKIP = re.compile(r"^skipconv\.0\.(weight|bias)$")
_HEAD = re.compile(r"^prediction\.head\.(\d+)\.([01])\.(.+)$")

_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}


class ConversionReport:
    def __init__(self):
        self.mapped: List[Tuple[str, str]] = []      # (src, dst)
        self.zero_filled: List[str] = []
        self.dropped: List[str] = []                 # num_batches_tracked
        self.unhandled: List[str] = []               # source keys w/o rule
        self.missing: List[str] = []                 # target leaves w/o src

    def summary(self) -> str:
        return (f"mapped={len(self.mapped)} zero_filled={len(self.zero_filled)} "
                f"dropped={len(self.dropped)} unhandled={len(self.unhandled)} "
                f"missing={len(self.missing)}")


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch pointwise conv/linear weight -> flax Dense kernel (in, out)."""
    w = np.asarray(w)
    while w.ndim > 2:
        if w.shape[-1] != 1:
            raise ValueError(f"non-pointwise conv kernel {w.shape}")
        w = w[..., 0]
    return np.ascontiguousarray(w.T.astype(np.float32))


def _translate(key: str, sd_keys) -> Tuple[str, str, Any]:
    """(collection, 'a/b/c' path, transform) for one reference key, or
    ('drop'|'unhandled', key, None)."""
    m = _STAGE.match(key)
    if m:
        stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if block != 0:
            return "unhandled", key, None
        enc = f"encoder/enc{stage}_sa"
        mc = _CONV.match(rest)
        if mc:
            j, sub, leaf = int(mc.group(1)), mc.group(2), mc.group(3)
            base = f"{enc}/ConvBlock_{j}"
            if sub == "0":  # conv
                if leaf == "weight":
                    return "params", f"{base}/Dense_0/kernel", _dense_kernel
                if leaf == "bias":
                    return "params", f"{base}/Dense_0/bias", None
            else:  # batch norm
                if leaf in _BN_PARAM:
                    return ("params",
                            f"{base}/NormAct_0/BatchNorm_0/{_BN_PARAM[leaf]}",
                            None)
                if leaf in _BN_STAT:
                    return ("batch_stats",
                            f"{base}/NormAct_0/BatchNorm_0/{_BN_STAT[leaf]}",
                            None)
                if leaf == "num_batches_tracked":
                    return "drop", key, None
            return "unhandled", key, None
        ms = _SKIP.match(rest)
        if ms:
            leaf = ms.group(1)
            if leaf == "weight":
                return "params", f"{enc}/skipconv/kernel", _dense_kernel
            return "params", f"{enc}/skipconv/bias", None
        return "unhandled", key, None

    m = _HEAD.match(key)
    if m:
        i, sub, leaf = int(m.group(1)), m.group(2), m.group(3)
        # a Linear followed by BatchNorm at .1 is LinearBlock_{i//2};
        # the final classifier Linear has a bias and no norm sibling
        has_bn = f"prediction.head.{i}.1.weight" in sd_keys
        if sub == "0":
            base = (f"prediction/LinearBlock_{i // 2}/Dense_0" if has_bn
                    else "prediction/Dense_0")
            if leaf == "weight":
                return "params", f"{base}/kernel", _dense_kernel
            if leaf == "bias":
                return "params", f"{base}/bias", None
        else:
            base = f"prediction/LinearBlock_{i // 2}/NormAct_0/BatchNorm_0"
            if leaf in _BN_PARAM:
                return "params", f"{base}/{_BN_PARAM[leaf]}", None
            if leaf in _BN_STAT:
                return "batch_stats", f"{base}/{_BN_STAT[leaf]}", None
            if leaf == "num_batches_tracked":
                return "drop", key, None
        return "unhandled", key, None

    return "unhandled", key, None


def _flatten(tree, prefix="") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def _set_path(tree: dict, path: str, value) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_reference_state_dict(sd: Dict[str, Any], variables: Dict[str, Any],
                                 strict: bool = True):
    """Map a reference torch ``state_dict`` onto our model ``variables``.

    ``sd``: {torch key: array-like} — tensors or numpy arrays (values are
    converted with ``np.asarray``; pass ``{k: v.numpy() for ...}`` or let
    this handle cpu tensors directly).
    ``variables``: the target ``model.init(...)`` output — used for
    structural validation; returned tree has the same structure with
    converted values.

    Returns ``(new_variables, ConversionReport)``. With ``strict=True``
    raises ValueError on unhandled source keys, shape mismatches, or
    uncovered target leaves (other than the documented zero-filled head
    biases).
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    report = ConversionReport()
    target_flat = {c: _flatten(variables.get(c, {})) for c in
                   ("params", "batch_stats")}
    covered = {c: set() for c in target_flat}
    out = {c: {} for c in target_flat}

    errors: List[str] = []
    for key in sorted(sd):
        coll, path, tf = _translate(key, sd.keys())
        if coll == "drop":
            report.dropped.append(key)
            continue
        if coll == "unhandled":
            report.unhandled.append(key)
            continue
        if path not in target_flat[coll]:
            errors.append(f"{key} -> {coll}:{path} (no such target leaf)")
            continue
        val = np.asarray(sd[key], dtype=np.float32)
        val = tf(val) if tf is not None else val
        want = tuple(np.shape(target_flat[coll][path]))
        if tuple(val.shape) != want:
            errors.append(f"{key} -> {coll}:{path}: shape {val.shape} "
                          f"vs model {want}")
            continue
        _set_path(out[coll], path, val)
        covered[coll].add(path)
        report.mapped.append((key, f"{coll}:{path}"))

    # zero-fill the documented bias gap; anything else uncovered is an error
    for coll, flat in target_flat.items():
        for path, leaf in flat.items():
            if path in covered[coll]:
                continue
            if (coll == "params" and path.startswith("prediction/LinearBlock")
                    and path.endswith("Dense_0/bias")):
                _set_path(out[coll], path, np.zeros(np.shape(leaf), np.float32))
                report.zero_filled.append(path)
            else:
                report.missing.append(f"{coll}:{path}")

    if strict and (errors or report.unhandled or report.missing):
        raise ValueError(
            "reference checkpoint conversion failed:\n  errors: "
            f"{errors[:10]}\n  unhandled: {report.unhandled[:10]}\n  "
            f"missing: {report.missing[:10]}\n  ({report.summary()})")

    new_vars = dict(variables)
    for coll in out:
        if target_flat[coll]:
            new_vars[coll] = out[coll]
    return new_vars, report
