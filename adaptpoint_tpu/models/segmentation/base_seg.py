"""Segmentation wrappers + head.

Parity: openpoints/models/segmentation/base_seg.py:14-253 (BaseSeg,
BasePartSeg, SegHead): encoder forward_seg_feat -> FP decoder -> per-point
MLP head; BasePartSeg threads the shape-class label into the part decoder.
"""
from __future__ import annotations

import copy
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS, build_model_from_cfg
from ..layers.blocks import ConvBlock, torch_linear_init


@MODELS.register_module()
class SegHead(nn.Module):
    """Per-point MLP head (parity: base_seg.py:93-160 SegHead)."""

    num_classes: int
    in_channels: Optional[int] = None
    mlps: Optional[Sequence[int]] = None
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    dropout: float = 0.5
    global_feat: Optional[str] = None

    @nn.compact
    def __call__(self, f, training: bool = False):
        # f (B, N, C) channels-last
        x = f
        if self.global_feat is not None:
            feats = [x]
            n = x.shape[1]
            for pre in self.global_feat.split(","):
                if "max" in pre:
                    g = jnp.max(x, axis=1, keepdims=True)
                else:
                    g = jnp.mean(x, axis=1, keepdims=True)
                feats.append(jnp.broadcast_to(g, x.shape))
            x = jnp.concatenate(feats, axis=-1)
        in_ch = x.shape[-1]
        mlps = list(self.mlps) if self.mlps is not None else [in_ch]
        norm_args = self.norm_args or {"norm": "bn1d"}
        act_args = self.act_args or {"act": "relu"}
        for i, c in enumerate(mlps):
            x = ConvBlock(c, norm_args=norm_args, act_args=act_args)(x, training)
            if self.dropout and i == len(mlps) - 1:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return nn.Dense(self.num_classes, kernel_init=torch_linear_init)(x)


@MODELS.register_module()
class BaseSeg(nn.Module):
    """Encoder + decoder + head (parity: base_seg.py:14-51)."""

    encoder_args: dict
    decoder_args: Optional[dict] = None
    cls_args: Optional[dict] = None

    def setup(self):
        self.encoder = build_model_from_cfg(self.encoder_args)
        if self.decoder_args is not None:
            dec = dict(copy.deepcopy(dict(self.encoder_args)))
            dec.update(dict(self.decoder_args))
            dec["encoder_channel_list"] = self.encoder.channel_list
            self.decoder = build_model_from_cfg(dec)
        else:
            self.decoder = None
        if self.cls_args is not None:
            cls_args = dict(self.cls_args)
            if cls_args.get("in_channels") is None:
                if self.decoder is not None and hasattr(self.decoder, "out_channels"):
                    cls_args["in_channels"] = self.decoder.out_channels
                else:
                    cls_args["in_channels"] = self.encoder.out_channels
            self.head = build_model_from_cfg(cls_args)
        else:
            self.head = None

    def __call__(self, pos, x=None, training: bool = False):
        p, f = self.encoder.forward_seg_feat(pos, x, training)
        if self.decoder is not None:
            f = self.decoder(p, f, training)
        elif isinstance(f, list):
            f = f[-1]
        if self.head is not None:
            f = self.head(f, training)
        return f  # (B, N, num_classes)


@MODELS.register_module()
class VariableSeg(BaseSeg):
    """Variable-batch seg wrapper (parity: base_seg.py:75-89). The reference
    flattens variable clouds into one packed batch; the TPU-native design
    keeps dense fixed shapes (loader pads, n_valid masks the loss), so the
    forward is identical to BaseSeg with a VariableSegHead."""


@MODELS.register_module()
class VariableSegHead(nn.Module):
    """Linear per-point head (parity: base_seg.py:153-188): two linear
    blocks [C->C] + dropout then the class projection."""

    num_classes: int
    in_channels: Optional[int] = None
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    dropout: float = 0.5

    @nn.compact
    def __call__(self, f, training: bool = False):
        norm_args = self.norm_args or {"norm": "bn1d"}
        act_args = self.act_args or {"act": "relu"}
        x = ConvBlock(f.shape[-1], norm_args=norm_args,
                      act_args=act_args)(f, training)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return nn.Dense(self.num_classes, kernel_init=torch_linear_init)(x)


@MODELS.register_module()
class MultiSegHead(nn.Module):
    """Per-shape-class part heads (parity: base_seg.py:190-234): one small
    conv head per shape category, each predicting that category's part count;
    returns the list of per-category logits. Padded to max(num_parts) and
    stacked would also work, but callers index by shape class."""

    num_classes: int
    in_channels: Optional[int] = None
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    dropout: float = 0.0
    shape_classes: int = 16
    num_parts: Sequence[int] = (4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3)

    @nn.compact
    def __call__(self, f, training: bool = False):
        norm_args = self.norm_args or {"norm": "bn1d"}
        act_args = self.act_args or {"act": "relu"}
        out = []
        for i in range(self.shape_classes):
            x = ConvBlock(f.shape[-1], norm_args=norm_args, act_args=act_args,
                          name=f"head{i}_mlp")(f, training)
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
            out.append(nn.Dense(self.num_parts[i],
                                kernel_init=torch_linear_init,
                                name=f"head{i}_cls")(x))
        return out


@MODELS.register_module()
class BasePartSeg(BaseSeg):
    """Part segmentation: class label conditions the decoder
    (parity: base_seg.py:53-72)."""

    def __call__(self, pos, x=None, cls0=None, training: bool = False):
        p, f = self.encoder.forward_seg_feat(pos, x, training)
        if self.decoder is not None:
            f = self.decoder(p, f, cls0, training)
        elif isinstance(f, list):
            f = f[-1]
        if self.head is not None:
            f = self.head(f, training)
        return f
