"""AOT serving artifacts: jax.export StableHLO bundles with baked-in params.

Artifact layout (one directory)::

    manifest.json        model name, shapes, buckets, jax/platform info
    b{B}.stablehlo       serialized jax.export.Exported per batch bucket

Each bucket is the jitted eval forward (parity with
``engine.cls_trainer.make_eval_step``'s forward: slice to ``num_points``,
``pos = x[..., :3]``, fused-eval fastpath, eval-mode apply) exported at a
static batch size with the trained params/batch_stats closed over — they
are baked into the StableHLO as constants, so the artifact is
self-contained and the serving process never imports model code.

TPU note: Pallas kernels export as ``tpu_custom_call`` custom calls, which
``jax.export`` guards behind an explicit opt-in (the custom-call ABI is
less stable across jax versions than StableHLO). We retry with that check
disabled and record the fact in the manifest; CPU exports (the XLA
composite kernel path) need no such waiver.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["export_serving_artifact", "load_serving_artifact",
           "ServingModel", "preprocess_clouds"]

_MANIFEST = "manifest.json"


def _infer_fn(model, variables, num_points: int, in_channels: int):
    from ..utils.fastpath import fused_eval, fused_eval_env

    def infer(x):
        pts = x[:, :num_points]
        pos = pts[..., :3]
        feat = pts[..., :in_channels]
        with fused_eval(fused_eval_env()):
            return model.apply(variables, pos, feat, training=False)

    return infer


def export_serving_artifact(model, variables: Dict[str, Any], out_dir: str,
                            *, num_points: int, in_channels: int,
                            batch_sizes: Sequence[int] = (1, 8, 32),
                            model_name: str = "",
                            extra_manifest: Optional[Dict[str, Any]] = None
                            ) -> Dict[str, Any]:
    """Export the eval forward at each batch bucket; returns the manifest.

    ``variables`` is the eval-mode variable dict
    (``{"params": ..., "batch_stats": ...}``); its leaves are baked into
    the artifact as constants.
    """
    os.makedirs(out_dir, exist_ok=True)
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive: {batch_sizes}")
    infer = _infer_fn(model, variables, num_points, in_channels)

    platforms = None
    num_classes = None
    disabled = False
    for b in batch_sizes:
        spec = jax.ShapeDtypeStruct((b, num_points, in_channels),
                                    jnp.float32)
        try:
            exported = jax_export.export(jax.jit(infer))(spec)
        except ValueError:
            # Pallas kernels on TPU surface as tpu_custom_call, which
            # export() rejects without an explicit waiver.
            exported = jax_export.export(
                jax.jit(infer),
                disabled_checks=[jax_export.DisabledSafetyCheck.custom_call(
                    "tpu_custom_call")])(spec)
            disabled = True
        platforms = list(exported.platforms)
        num_classes = int(exported.out_avals[0].shape[-1])
        with open(os.path.join(out_dir, f"b{b}.stablehlo"), "wb") as f:
            f.write(exported.serialize())

    manifest = {
        "format": "adaptpoint-tpu-serving-v1",
        "model_name": model_name,
        "num_points": int(num_points),
        "in_channels": int(in_channels),
        "num_classes": num_classes,
        "batch_sizes": batch_sizes,
        "platforms": platforms,
        "jax_version": jax.__version__,
        "tpu_custom_call_waiver": disabled,
    }
    if extra_manifest:
        manifest.update(extra_manifest)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingModel:
    """Batching front-end over an exported artifact directory.

    ``predict(x)`` takes ``(n, N, C)`` float32 clouds (or one ``(N, C)``
    cloud) and returns ``(n, num_classes)`` logits: requests route to the
    smallest bucket that fits (short rows padded by repeating the first
    cloud — eval-mode forwards are per-sample independent) and chunk by
    the largest bucket when ``n`` exceeds it.
    """

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format") != "adaptpoint-tpu-serving-v1":
            raise ValueError(f"not a serving artifact: {path}")
        self.batch_sizes = list(self.manifest["batch_sizes"])
        self.num_points = int(self.manifest["num_points"])
        self.in_channels = int(self.manifest["in_channels"])
        self.num_classes = int(self.manifest["num_classes"])
        self._fns: Dict[int, Any] = {}

    def _bucket_fn(self, b: int):
        fn = self._fns.get(b)
        if fn is None:
            with open(os.path.join(self.path, f"b{b}.stablehlo"), "rb") as f:
                exported = jax_export.deserialize(f.read())
            fn = jax.jit(exported.call)
            self._fns[b] = fn
        return fn

    def _run_bucket(self, x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        b = next((bs for bs in self.batch_sizes if bs >= n),
                 self.batch_sizes[-1])
        if n < b:  # pad by repeating the first cloud
            x = np.concatenate([x, np.repeat(x[:1], b - n, axis=0)], axis=0)
        logits = np.asarray(self._bucket_fn(b)(jnp.asarray(x)))
        return logits[:n]

    def predict(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        single = x.ndim == 2
        if single:
            x = x[None]
        if x.ndim != 3 or x.shape[1] < self.num_points \
                or x.shape[2] < self.in_channels:
            raise ValueError(
                f"expected (n, >={self.num_points}, >={self.in_channels}) "
                f"clouds, got {x.shape}")
        x = x[:, :self.num_points, :self.in_channels]
        bmax = self.batch_sizes[-1]
        outs = [self._run_bucket(x[i:i + bmax])
                for i in range(0, x.shape[0], bmax)]
        logits = np.concatenate(outs, axis=0)
        return logits[0] if single else logits

    def predict_labels(self, x: np.ndarray) -> np.ndarray:
        return np.argmax(self.predict(x), axis=-1)


def load_serving_artifact(path: str) -> ServingModel:
    return ServingModel(path)


def preprocess_clouds(xyz: np.ndarray, *, gravity_dim: int = 1,
                      append_height: bool = True) -> np.ndarray:
    """Raw ``(n, N, 3)`` clouds -> model input ``(n, N, 3[+1])``.

    Mirrors the eval pipeline for the classification benchmarks:
    per-cloud height feature from the PRE-centering gravity axis
    (``h - h.min()``), then center + unit-sphere normalize (parity:
    transforms/point_transforms.py PointCloudCenterAndNormalize and the
    ScanObjectNN loader's height append, scanobjectnn.py:81-98).
    """
    xyz = np.asarray(xyz, np.float32)
    single = xyz.ndim == 2
    if single:
        xyz = xyz[None]
    h = xyz[:, :, gravity_dim:gravity_dim + 1]
    heights = h - h.min(axis=1, keepdims=True)
    pos = xyz - xyz.mean(axis=1, keepdims=True)
    scale = np.sqrt((pos ** 2).sum(-1, keepdims=True)).max(
        axis=1, keepdims=True)
    pos = pos / scale
    out = np.concatenate([pos, heights], -1) if append_height else pos
    return out[0] if single else out
