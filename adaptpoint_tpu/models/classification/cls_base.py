"""Classification wrapper + head.

Parity: openpoints/models/classification/cls_base.py:12-136 (BaseCls, ClsHead).
Loss coupling (get_logits_loss) lives in the functional engine
(adaptpoint_tpu/engine) rather than inside the module — idiomatic JAX.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS, build_model_from_cfg
from ..layers.blocks import LinearBlock, torch_linear_init


@MODELS.register_module()
class ClsHead(nn.Module):
    """MLP classification head (parity: cls_base.py:77-136 ClsHead)."""

    num_classes: int
    in_channels: Optional[int] = None
    mlps: Optional[Sequence[int]] = (256,)
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    dropout: float = 0.5
    global_feat: Optional[str] = None
    point_dim: int = 1  # channels-last: points axis is 1

    @nn.compact
    def __call__(self, end_points, training: bool = False):
        x = end_points
        if self.global_feat is not None:
            feats = []
            for pre in self.global_feat.split(","):
                if "max" in pre:
                    feats.append(jnp.max(x, axis=self.point_dim))
                elif pre in ("avg", "mean"):
                    feats.append(jnp.mean(x, axis=self.point_dim))
            x = jnp.concatenate(feats, axis=-1)
        act_args = self.act_args or {"act": "relu"}
        for c in (self.mlps or []):
            x = LinearBlock(c, norm_args=self.norm_args, act_args=act_args,
                            dropout=self.dropout)(x, training)
        return nn.Dense(self.num_classes, kernel_init=torch_linear_init)(x)


@MODELS.register_module()
class BaseCls(nn.Module):
    """Encoder + ClsHead composition (parity: cls_base.py:12-39 BaseCls)."""

    encoder_args: dict
    cls_args: Optional[dict] = None
    criterion_args: Optional[dict] = None  # consumed by the engine

    def setup(self):
        self.encoder = build_model_from_cfg(self.encoder_args)
        if self.cls_args is not None:
            cls_args = dict(self.cls_args)
            if cls_args.get("in_channels") is None and hasattr(self.encoder, "out_channels"):
                cls_args["in_channels"] = self.encoder.out_channels
            self.prediction = build_model_from_cfg(cls_args)
        else:
            self.prediction = None

    def __call__(self, pos, x=None, training: bool = False):
        feat = self.encoder.forward_cls_feat(pos, x, training)
        if self.prediction is None:
            return feat
        return self.prediction(feat, training)


@MODELS.register_module()
class DistillCls(nn.Module):
    """Student classifier with a distillation head
    (parity: cls_base.py:43-74 DistillCls): the encoder (built with
    ``distill=True``) returns (global_feat, distill_token_feat) in training;
    logits come from the cls head, distill logits from ``dist_head``. The
    frozen teacher model lives in the engine/loss (a separate params pytree —
    idiomatic JAX), not inside this module; DistillLoss consumes
    (student_logits, dist_logits, teacher_logits)."""

    encoder_args: dict
    cls_args: Optional[dict] = None
    distill_args: Optional[dict] = None
    criterion_args: Optional[dict] = None  # consumed by the engine

    def setup(self):
        enc_args = dict(self.encoder_args)
        enc_args.setdefault("distill", True)
        self.distill = bool(enc_args.get("distill", True))
        self.encoder = build_model_from_cfg(enc_args)
        if self.cls_args is not None:
            cls_args = dict(self.cls_args)
            if cls_args.get("in_channels") is None and hasattr(
                    self.encoder, "out_channels"):
                cls_args["in_channels"] = self.encoder.out_channels
            self.prediction = build_model_from_cfg(cls_args)
        else:
            self.prediction = None
        head_args = dict((self.distill_args or {}).get(
            "distill_head_args", {"NAME": "ClsHead", "num_classes": 15,
                                  "mlps": None}))
        if head_args.get("in_channels") is None and hasattr(
                self.encoder, "distill_channels"):
            head_args["in_channels"] = self.encoder.distill_channels
        self.dist_head = build_model_from_cfg(head_args)

    def __call__(self, pos, x=None, training: bool = False):
        out = self.encoder.forward_cls_feat(pos, x, training)
        if self.distill and training:
            global_feat, dist_feat = out
            return (self.prediction(global_feat, training),
                    self.dist_head(dist_feat, training))
        return self.prediction(out, training)
