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

Covered layouts (each pinned by a ``tests/fixtures/ref_layout_*.json``
dumped from the actual reference model, scripts/dump_ref_layouts.py):

- PointNeXt single-SA-block stages (``encoder.encoder.{s}.0``) and
  InvResMLP depth blocks (``encoder.encoder.{s}.{b>0}.convs.convs`` +
  ``pwconv`` — PointNeXt-B/L/XL, reference pointnext.py:229-276);
- ClsHead (``prediction.head``), SegHead (``head.head``,
  reference base_seg.py:93-160);
- PointNextDecoder / PointNextPartDecoder FP stacks
  (``decoder.decoder.{i}.0.convs`` + part-seg ``decoder.global_conv{1,2}``
  / ``decoder.convc`` class embeddings, pointnext.py:459-663);
- PointNet2Encoder (``encoder.SA_modules.{s}.local_aggregations.0
  .SA_CONFIG_operator.convs``, pointnetv2.py:149);
- DGCNN (``encoder.head.gconv.nn`` / ``encoder.backbone.{i}.gconv.nn`` /
  ``encoder.fusion_block``, dgcnn.py:12);
- PointNet (``encoder.stn``/``encoder.fstn`` STN3d/STNkd + the
  ``conv0_1..conv3`` trunk, pointnet.py:13-175);
- PointMLPEncoder (``encoder.embedding`` / ``encoder.local_grouper_list``
  affine params / ``pre_blocks_list.{i}.transfer`` /
  ``{pre,pos}_blocks_list.{i}.operation.{j}.net{1,2}``,
  pointmlp.py:140-352) — with PointNet and PointMLP, every ScanObjectNN
  model-zoo row (docs/modelzoo.md:11-19) converts both directions;
- SimpleView MVModel (``img_model`` stem + resnet18 BasicBlock layers +
  ``final_fc.model`` MVFC, simpleview.py:61-152);
- PointViT (``encoder.patch_embed.conv{1,2}`` two-stage embed — in2d
  InstanceNorm is paramless — ``cls_token``/``cls_pos``/``pos_embed``,
  ``blocks.{i}`` packed-qkv transformer blocks, final ``norm``;
  pointvit.py:17-176 + layers/group_embed.py:59-170);
- the AdaptPoint GAN pair as saved by the reference trainer's
  ``save_ganmodel`` (train_autoaug.py:71-78):
  AdaptPoint_Augmentor (generator_component4_15.py:118) via
  :func:`convert_reference_generator` and the spectral-norm
  PointDiscriminator1 (point_discriminator.py:16) via
  :func:`convert_reference_discriminator`.

Anything else is rejected with an explicit unhandled-key list rather than
silently partially converted.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = ["convert_reference_state_dict", "convert_reference_generator",
           "convert_reference_discriminator", "export_reference_state_dict",
           "export_reference_generator", "export_reference_discriminator",
           "ConversionReport"]

_STAGE = re.compile(r"^encoder\.encoder\.(\d+)\.(\d+)\.(.+)$")
_CONV = re.compile(r"^convs\.(\d+)\.([01])\.(.+)$")
_LACONV = re.compile(r"^convs\.convs\.(\d+)\.([01])\.(.+)$")
_PWCONV = re.compile(r"^pwconv\.(\d+)\.([01])\.(.+)$")
_SKIP = re.compile(r"^skipconv\.0\.(weight|bias)$")
_HEAD = re.compile(r"^prediction\.head\.(\d+)\.([01])\.(.+)$")
_SEGHEAD = re.compile(r"^head\.head\.(\d+)\.([01])\.(.+)$")
_DEC = re.compile(r"^decoder\.decoder\.(\d+)\.(\d+)\.convs\.(\d+)\.([01])\.(.+)$")
_DEC_GLOBAL = re.compile(r"^decoder\.(global_conv[12]|convc)\.0\.0\.(weight|bias)$")
_PN2 = re.compile(r"^encoder\.SA_modules\.(\d+)\.local_aggregations\.(\d+)\."
                  r"SA_CONFIG_operator\.convs\.(\d+)\.([01])\.(.+)$")
_PMLP_EMB = re.compile(r"^encoder\.embedding\.net\.([01])\.(.+)$")
_PMLP_AFF = re.compile(r"^encoder\.local_grouper_list\.(\d+)\."
                       r"(affine_alpha|affine_beta)$")
_PMLP_TRANSFER = re.compile(r"^encoder\.pre_blocks_list\.(\d+)\.transfer\."
                            r"net\.([01])\.(.+)$")
_PMLP_RES = re.compile(r"^encoder\.(pre|pos)_blocks_list\.(\d+)\."
                       r"operation\.(\d+)\.net([12])\.([01])\.(.+)$")
# SimpleView MVModel (simpleview.py:61-152): img_model Sequential is
# [conv3x3, bn, relu, layer1..layer4, avgpool, squeeze]; each layer{L} has
# two BasicBlocks (conv1/bn1/conv2/bn2 + optional downsample conv+bn);
# final_fc.model = [BatchNormPoint, dropout, flatten, Linear, bn, relu,
# dropout, Linear].
_SV_STEM = re.compile(r"^img_model\.([01])\.(.+)$")
_SV_BLOCK = re.compile(r"^img_model\.([3-6])\.([01])\."
                       r"(conv1|bn1|conv2|bn2|downsample\.0|downsample\.1)"
                       r"\.(.+)$")
_SV_BLOCK_DST = {"conv1": ("params", "Conv_0"), "bn1": ("bn", "BatchNorm_0"),
                 "conv2": ("params", "Conv_1"), "bn2": ("bn", "BatchNorm_1"),
                 "downsample.0": ("params", "Conv_2"),
                 "downsample.1": ("bn", "BatchNorm_2")}
_SV_FC = re.compile(r"^final_fc\.model\.(0\.bn|3|4|7)\.(.+)$")
_SV_FC_DST = {"0.bn": ("bn", "mv_bn"), "3": ("dense", "fc1"),
              "4": ("bn", "fc_bn"), "7": ("dense", "fc2")}

# PointViT (pointvit.py:17-176 + layers/group_embed.py:59-170 +
# layers/attention.py:12-58): the patch-embed convs flatten to Dense_0..3
# (in2d InstanceNorm is paramless), transformer blocks keep torch's own
# member names (norm1/attn.qkv/attn.proj/norm2/mlp.fc1/mlp.fc2).
_VIT_TOKEN = re.compile(r"^encoder\.(cls_token|cls_pos|dist_token|dist_pos)$")
_VIT_POS = re.compile(r"^encoder\.pos_embed\.(0\.0|1)\.(weight|bias)$")
_VIT_EMBED = re.compile(r"^encoder\.patch_embed\.conv([12])\.(\d+)\.0\."
                        r"(weight|bias)$")
_VIT_BLOCK = re.compile(r"^encoder\.blocks\.(\d+)\."
                        r"(norm1|norm2|attn\.qkv|attn\.proj|mlp\.fc1|mlp\.fc2)"
                        r"\.(weight|bias)$")
_VIT_NORM = re.compile(r"^encoder\.norm\.(weight|bias)$")
_VIT_BLOCK_DST = {"norm1": ("ln", "norm1"), "norm2": ("ln", "norm2"),
                  "attn.qkv": ("dense", "attn/qkv"),
                  "attn.proj": ("dense", "attn/proj"),
                  "mlp.fc1": ("dense", "fc1"), "mlp.fc2": ("dense", "fc2")}

# PointNet (pointnet.py:13-175): fixed module names -> our _MLPBN slots.
# STN3d/STNkd: conv1/2/3 + fc1/2 are the five _MLPBN blocks, fc3 the bare
# final Dense; encoder trunk: conv0_1, conv0_2, conv1, conv2, conv3.
_PNET_STN_DENSE = {"conv1": "_MLPBN_0", "conv2": "_MLPBN_1",
                   "conv3": "_MLPBN_2", "fc1": "_MLPBN_3", "fc2": "_MLPBN_4"}
_PNET_STN_BN = {f"bn{i}": f"_MLPBN_{i - 1}" for i in range(1, 6)}
_PNET_TRUNK_DENSE = {"conv0_1": "_MLPBN_0", "conv0_2": "_MLPBN_1",
                     "conv1": "_MLPBN_2", "conv2": "_MLPBN_3",
                     "conv3": "_MLPBN_4"}
_PNET_TRUNK_BN = {"bn0_1": "_MLPBN_0", "bn0_2": "_MLPBN_1",
                  "bn1": "_MLPBN_2", "bn2": "_MLPBN_3", "bn3": "_MLPBN_4"}
_PNET_STN = re.compile(r"^encoder\.(stn|fstn)\.(conv\d|fc\d|bn\d)\.(.+)$")
_PNET_TRUNK = re.compile(r"^encoder\.(conv0_[12]|conv[123]|bn0_[12]|bn[123])"
                         r"\.(.+)$")
_DGCNN_HEAD = re.compile(r"^encoder\.head\.gconv\.nn\.([012])\.(.+)$")
_DGCNN_BLOCK = re.compile(r"^encoder\.backbone\.(\d+)\.gconv\.nn\.([012])\.(.+)$")
# DeepGCN Res/DenseDynBlock wraps its DynConv in `.body`
# (layers/graph_conv.py:92-125); head + fusion share the DGCNN patterns
_DEEPGCN_BLOCK = re.compile(
    r"^encoder\.backbone\.(\d+)\.body\.gconv\.nn\.([01])\.(.+)$")
# GroupPointNet: backbone.{i} ARE the convblocks (grouppointnet.py:54-61),
# conv-act-norm order -> norm at slot 2
_GPN_BLOCK = re.compile(r"^encoder\.backbone\.(\d+)\.([012])\.(.+)$")
_DGCNN_FUSION = re.compile(r"^encoder\.fusion_block\.([012])\.(.+)$")

_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}


class ConversionReport:
    def __init__(self):
        self.mapped: List[Tuple[str, str]] = []      # (src, dst)
        self.zero_filled: List[str] = []
        self.dropped: List[str] = []                 # num_batches_tracked
        self.unhandled: List[str] = []               # source keys w/o rule
        self.missing: List[str] = []                 # target leaves w/o src
        self.errors: List[str] = []                  # shape/routing failures

    def summary(self) -> str:
        return (f"mapped={len(self.mapped)} zero_filled={len(self.zero_filled)} "
                f"dropped={len(self.dropped)} unhandled={len(self.unhandled)} "
                f"missing={len(self.missing)} errors={len(self.errors)}")


def _overlay(base, patch):
    """Deep-merge ``patch`` over ``base`` (dicts recursed, leaves replaced)
    so tolerant conversions keep the target's init values for uncovered
    leaves — the result always has the full model structure and loads."""
    if not isinstance(base, dict) or not isinstance(patch, dict):
        return patch
    out = dict(base)
    for k, v in patch.items():
        out[k] = _overlay(base.get(k), v) if k in base else v
    return out


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch pointwise conv/linear weight -> flax Dense kernel (in, out)."""
    w = np.asarray(w)
    while w.ndim > 2:
        if w.shape[-1] != 1:
            raise ValueError(f"non-pointwise conv kernel {w.shape}")
        w = w[..., 0]
    return np.ascontiguousarray(w.T.astype(np.float32))


def _conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch 2D conv weight (O, I, kh, kw) -> flax Conv kernel
    (kh, kw, I, O)."""
    w = np.asarray(w)
    if w.ndim != 4:
        raise ValueError(f"non-2d conv kernel {w.shape}")
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 1, 0)).astype(np.float32))


def _pair(sub: str, leaf: str, dense_path: str, bn_path: str):
    """Triple for one leaf of a torch ``[conv|linear, BatchNorm]`` pair.

    ``sub`` is the Sequential slot ('0' = conv/linear, '1' = BN);
    ``dense_path``/``bn_path`` are the target flax module paths."""
    if sub == "0":
        if leaf == "weight":
            return "params", f"{dense_path}/kernel", _dense_kernel
        if leaf == "bias":
            return "params", f"{dense_path}/bias", None
    else:
        if leaf in _BN_PARAM:
            return "params", f"{bn_path}/{_BN_PARAM[leaf]}", None
        if leaf in _BN_STAT:
            return "batch_stats", f"{bn_path}/{_BN_STAT[leaf]}", None
        if leaf == "num_batches_tracked":
            return "drop", leaf, None
    return None


def _convblock(sub: str, leaf: str, base: str):
    """A torch conv+BN pair mapped onto our ConvBlock/LinearBlock tree."""
    return _pair(sub, leaf, f"{base}/Dense_0", f"{base}/NormAct_0/BatchNorm_0")


def _convblock_any(sub: str, leaf: str, base: str):
    """conv-norm-act (norm at Sequential slot 1 -> NormAct_0) OR
    conv-act-norm (act at 1, norm at 2 -> NormAct_1: ConvBlock's
    conv-act-norm branch constructs a second NormAct, blocks.py:202-207;
    the BallDGCNN family uses this order, ball_dgcnn.py:25)."""
    if sub == "2":
        return _pair("1", leaf, "", f"{base}/NormAct_1/BatchNorm_0")
    return _convblock(sub, leaf, base)


def _translate(key: str, sd_keys) -> Tuple[str, str, Any]:
    """(collection, 'a/b/c' path, transform) for one reference key, or
    ('drop'|'unhandled', key, None)."""
    m = _STAGE.match(key)
    if m:
        stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if block == 0:
            # SA block (pointnext.py:81-170) -> SetAbstraction enc{s}_sa
            enc = f"encoder/enc{stage}_sa"
            mc = _CONV.match(rest)
            if mc:
                j, sub, leaf = int(mc.group(1)), mc.group(2), mc.group(3)
                out = _convblock(sub, leaf, f"{enc}/ConvBlock_{j}")
                if out is not None:
                    return ("drop", key, None) if out[0] == "drop" else out
                return "unhandled", key, None
            ms = _SKIP.match(rest)
            if ms:
                leaf = ms.group(1)
                if leaf == "weight":
                    return "params", f"{enc}/skipconv/kernel", _dense_kernel
                return "params", f"{enc}/skipconv/bias", None
            return "unhandled", key, None
        # InvResMLP depth block (pointnext.py:229-276) -> enc{s}_b{b}:
        # convs.convs.{j} = LocalAggregation shared MLP, pwconv.{i} = the
        # pointwise chain
        blk = f"encoder/enc{stage}_b{block}"
        mc = _LACONV.match(rest)
        if mc:
            j, sub, leaf = int(mc.group(1)), mc.group(2), mc.group(3)
            out = _convblock(sub, leaf, f"{blk}/LocalAggregation_0/ConvBlock_{j}")
        else:
            mp = _PWCONV.match(rest)
            if mp:
                i, sub, leaf = int(mp.group(1)), mp.group(2), mp.group(3)
                out = _convblock(sub, leaf, f"{blk}/ConvBlock_{i}")
            else:
                out = None
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _HEAD.match(key)
    if m:
        i, sub, leaf = int(m.group(1)), m.group(2), m.group(3)
        # a Linear followed by BatchNorm at .1 is LinearBlock_{i//2};
        # the final classifier Linear has a bias and no norm sibling
        has_bn = f"prediction.head.{i}.1.weight" in sd_keys
        if has_bn:
            out = _convblock(sub, leaf, f"prediction/LinearBlock_{i // 2}")
        else:
            out = _pair(sub, leaf, "prediction/Dense_0", "")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _SEGHEAD.match(key)
    if m:
        # SegHead (base_seg.py:93-160): convblocks at even slots (dropout
        # odd), final Conv1d-with-bias (no BN sibling) -> head/Dense_0
        i, sub, leaf = int(m.group(1)), m.group(2), m.group(3)
        has_bn = f"head.head.{i}.1.weight" in sd_keys
        if has_bn:
            out = _convblock(sub, leaf, f"head/ConvBlock_{i // 2}")
        else:
            out = _pair(sub, leaf, "head/Dense_0", "")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _DEC.match(key)
    if m:
        # PointNextDecoder / PartDecoder FP stage (pointnext.py:459-663);
        # decoder_blocks > 1 (extra InvResMLP blocks inside a decoder
        # stage) is out of scope -> unhandled
        stage, block, j, sub, leaf = (int(m.group(1)), int(m.group(2)),
                                      int(m.group(3)), m.group(4), m.group(5))
        if block != 0:
            return "unhandled", key, None
        out = _convblock(sub, leaf, f"decoder/fp{stage}/ConvBlock_{j}")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _DEC_GLOBAL.match(key)
    if m:
        # part-seg class-embedding convs (pointnext.py:541-556): plain
        # conv + bias, no norm
        name, leaf = m.group(1), m.group(2)
        if leaf == "weight":
            return "params", f"decoder/{name}/Dense_0/kernel", _dense_kernel
        return "params", f"decoder/{name}/Dense_0/bias", None

    m = _PN2.match(key)
    if m:
        # PointNet2 SA stage (pointnetv2.py:149): one local aggregation per
        # stage in the classic protocol (multi-block = ASSANet, out of scope)
        s, b, j, sub, leaf = (int(m.group(1)), int(m.group(2)),
                              int(m.group(3)), m.group(4), m.group(5))
        if b != 0:
            return "unhandled", key, None
        out = _convblock(sub, leaf, f"encoder/sa{s}/ConvBlock_{j}")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _VIT_TOKEN.match(key)
    if m:
        return "params", f"encoder/{m.group(1)}", None

    m = _VIT_POS.match(key)
    if m:
        dst = "pos1" if m.group(1) == "0.0" else "pos2"
        if m.group(2) == "weight":
            return "params", f"encoder/{dst}/kernel", _dense_kernel
        return "params", f"encoder/{dst}/bias", None

    m = _VIT_EMBED.match(key)
    if m:
        conv, j, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        # conv2 indices continue after conv1's blocks (Dense_0..Dense_{L-1})
        n_conv1 = len({k.split(".")[3] for k in sd_keys
                       if k.startswith("encoder.patch_embed.conv1.")}) or 2
        slot = j if conv == 1 else n_conv1 + j
        dst = f"encoder/patch_embed/Dense_{slot}"
        if leaf == "weight":
            return "params", f"{dst}/kernel", _dense_kernel
        return "params", f"{dst}/bias", None

    m = _VIT_BLOCK.match(key)
    if m:
        i, kind_leaf = m.group(1), _VIT_BLOCK_DST[m.group(2)]
        kind, dst = kind_leaf
        base = f"encoder/block{i}/{dst}"
        leaf = m.group(3)
        if kind == "ln":
            return "params", f"{base}/{'scale' if leaf == 'weight' else 'bias'}", None
        if leaf == "weight":
            return "params", f"{base}/kernel", _dense_kernel
        return "params", f"{base}/bias", None

    m = _VIT_NORM.match(key)
    if m:
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return "params", f"encoder/norm/{leaf}", None

    m = _SV_STEM.match(key)
    if m:
        if m.group(1) == "0":  # 3x3 stem conv, no bias
            if m.group(2) == "weight":
                return "params", "stem/kernel", _conv2d_kernel
            return "unhandled", key, None
        out = _pair("1", m.group(2), "", "stem_bn")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _SV_BLOCK.match(key)
    if m:
        layer, blk = int(m.group(1)) - 3, "ab"[int(m.group(2))]
        kind, dst = _SV_BLOCK_DST[m.group(3)]
        base = f"res{layer}{blk}"
        leaf = m.group(4)
        if kind == "params":
            if leaf == "weight":
                return "params", f"{base}/{dst}/kernel", _conv2d_kernel
            return "unhandled", key, None
        out = _pair("1", leaf, "", f"{base}/{dst}")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _SV_FC.match(key)
    if m:
        kind, dst = _SV_FC_DST[m.group(1)]
        leaf = m.group(2)
        if kind == "dense":
            if leaf == "weight":
                return "params", f"{dst}/kernel", _dense_kernel
            return "params", f"{dst}/bias", None
        out = _pair("1", leaf, "", dst)
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _PNET_STN.match(key)
    if m:
        tnet, mod, leaf = m.group(1), m.group(2), m.group(3)
        base = f"encoder/{tnet}"
        if mod == "fc3":  # identity-initialized final transform Dense
            dst = f"{base}/Dense_0"
            if leaf == "weight":
                return "params", f"{dst}/kernel", _dense_kernel
            return "params", f"{dst}/bias", None
        if mod in _PNET_STN_DENSE:
            dst = f"{base}/{_PNET_STN_DENSE[mod]}/Dense_0"
            if leaf == "weight":
                return "params", f"{dst}/kernel", _dense_kernel
            return "params", f"{dst}/bias", None
        if mod in _PNET_STN_BN:
            out = _pair("1", leaf, "",
                        f"{base}/{_PNET_STN_BN[mod]}/BatchNorm_0")
            if out is not None:
                return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _PNET_TRUNK.match(key)
    if m and "encoder.stn." not in key and "encoder.fstn." not in key:
        mod, leaf = m.group(1), m.group(2)
        if mod in _PNET_TRUNK_DENSE:
            dst = f"encoder/{_PNET_TRUNK_DENSE[mod]}/Dense_0"
            if leaf == "weight":
                return "params", f"{dst}/kernel", _dense_kernel
            return "params", f"{dst}/bias", None
        if mod in _PNET_TRUNK_BN:
            out = _pair("1", leaf, "",
                        f"encoder/{_PNET_TRUNK_BN[mod]}/BatchNorm_0")
            if out is not None:
                return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _PMLP_EMB.match(key)
    if m:
        # PointMLP embedding ConvBNReLU1D (pointmlp.py:199-209) — our
        # _ConvBNAct scope has a bare Dense_0 + BatchNorm_0 (no NormAct)
        out = _pair(m.group(1), m.group(2), "encoder/embedding/Dense_0",
                    "encoder/embedding/BatchNorm_0")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _PMLP_AFF.match(key)
    if m:
        # LocalGrouper geometric-affine params (pointmlp.py:165-167):
        # (1,1,1,C) on both sides, no transform
        return "params", f"encoder/grouper{m.group(1)}/{m.group(2)}", None

    m = _PMLP_TRANSFER.match(key)
    if m:
        out = _pair(m.group(2), m.group(3),
                    f"encoder/pre{m.group(1)}_transfer/Dense_0",
                    f"encoder/pre{m.group(1)}_transfer/BatchNorm_0")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _PMLP_RES.match(key)
    if m:
        # ConvBNReLURes1D (pointmlp.py:213-243): net1 = expansion conv
        # (our _ResMLP's _ConvBNAct_0), net2 = projection conv + BN (the
        # _ResMLP-scope Dense_0/BatchNorm_0)
        kind, i, j, net, sub, leaf = (m.group(1), m.group(2), m.group(3),
                                      m.group(4), m.group(5), m.group(6))
        base = f"encoder/{kind}{i}_res{j}"
        if net == "1":
            out = _pair(sub, leaf, f"{base}/_ConvBNAct_0/Dense_0",
                        f"{base}/_ConvBNAct_0/BatchNorm_0")
        else:
            out = _pair(sub, leaf, f"{base}/Dense_0", f"{base}/BatchNorm_0")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _DGCNN_HEAD.match(key)
    if m:
        out = _convblock_any(m.group(1), m.group(2), "encoder/head/ConvBlock_0")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _DGCNN_BLOCK.match(key) or _DEEPGCN_BLOCK.match(key)
    if m:
        out = _convblock_any(m.group(2), m.group(3),
                             f"encoder/block{m.group(1)}/ConvBlock_0")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _GPN_BLOCK.match(key)
    if m:
        out = _convblock_any(m.group(2), m.group(3),
                             f"encoder/conv{m.group(1)}")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    m = _DGCNN_FUSION.match(key)
    if m:
        # fusion_block is itself the ConvBlock module (named 'fusion')
        out = _convblock_any(m.group(1), m.group(2), "encoder/fusion")
        if out is not None:
            return ("drop", key, None) if out[0] == "drop" else out
        return "unhandled", key, None

    return "unhandled", key, None


# AdaptPoint_Augmentor sites (generator_component4_15.py:588-718
# SAComponent) -> our adapt/augmentor.py module names. Each row: source
# prefix under ``predict_prob_layer.`` (conv at .0, BN at .1) -> (Dense
# module path, BatchNorm module path) under ``predict_prob_layer/``.
_GEN_PAIR_SITES = [
    (re.compile(r"^embedding\.net\.([01])\.(.+)$"),
     lambda m: ("embedding/Dense_0", "embedding/BatchNorm_0")),
    (re.compile(r"^extract_feat_list\.(\d+)\.net\.([01])\.(.+)$"),
     lambda m: (f"pre{m.group(1)}/Dense_0", f"pre{m.group(1)}/BatchNorm_0")),
    (re.compile(r"^decode_list\.(\d+)\.fuse\.net\.([01])\.(.+)$"),
     lambda m: (f"fp{m.group(1)}/ConvBNReLU_0/Dense_0",
                f"fp{m.group(1)}/ConvBNReLU_0/BatchNorm_0")),
    (re.compile(r"^head\.global_layer\.([01])\.(.+)$"),
     lambda m: ("head/global_conv", "head/global_bn")),
    (re.compile(r"^head\.prob_head\.([01])\.(.+)$"),
     lambda m: ("head/prob_head", "head/prob_bn")),
    (re.compile(r"^head\.anchor_selfattention\.pos_embedding\.([01])\.(.+)$"),
     lambda m: ("head/anchor_attn/pos_embedding", "head/anchor_attn/pos_bn")),
    (re.compile(r"^head\.anchor_selfattention\.res\.([01])\.(.+)$"),
     lambda m: ("head/anchor_attn/res", "head/anchor_attn/res_bn")),
    (re.compile(r"^localfeat_mask_selfattention\.pos_embedding\.([01])\.(.+)$"),
     lambda m: ("mask_attn/pos_embedding", "mask_attn/pos_bn")),
    (re.compile(r"^localfeat_mask_selfattention\.res\.([01])\.(.+)$"),
     lambda m: ("mask_attn/res", "mask_attn/res_bn")),
    (re.compile(r"^extract_local_feat_masking\.([01])\.(.+)$"),
     lambda m: ("mask_local", "mask_local_bn")),
    (re.compile(r"^extract_global_feat_masking\.([01])\.(.+)$"),
     lambda m: ("mask_global", "mask_global_bn")),
    (re.compile(r"^fuse_masking\.([01])\.(.+)$"),
     lambda m: ("mask_fuse", "mask_fuse_bn")),
]
_GEN_QKV = re.compile(
    r"^(head\.anchor_selfattention|localfeat_mask_selfattention)"
    r"\.to_qkv\.weight$")
_GEN_QKV_DST = {"head.anchor_selfattention": "head/anchor_attn",
                "localfeat_mask_selfattention": "mask_attn"}
_GEN_AFFINE = re.compile(
    r"^pointset_grouper_list\.(\d+)\.(affine_alpha|affine_beta)$")


def _translate_generator(key: str) -> Tuple[str, str, Any]:
    pfx = "predict_prob_layer."
    if not key.startswith(pfx):
        return "unhandled", key, None
    rest = key[len(pfx):]
    root = "predict_prob_layer"
    for rx, dst in _GEN_PAIR_SITES:
        m = rx.match(rest)
        if m:
            dense, bn = dst(m)
            sub, leaf = m.group(m.lastindex - 1), m.group(m.lastindex)
            out = _pair(sub, leaf, f"{root}/{dense}", f"{root}/{bn}")
            if out is not None:
                return ("drop", key, None) if out[0] == "drop" else out
            return "unhandled", key, None
    m = _GEN_QKV.match(rest)
    if m:
        return ("params", f"{root}/{_GEN_QKV_DST[m.group(1)]}/to_qkv/kernel",
                _dense_kernel)
    m = _GEN_AFFINE.match(rest)
    if m:
        return "params", f"{root}/grouper{m.group(1)}/{m.group(2)}", None
    return "unhandled", key, None


def convert_reference_generator(sd: Dict[str, Any],
                                variables: Dict[str, Any], strict=True):
    """Map a reference AdaptPoint_Augmentor state_dict onto our flax
    augmentor variables (same contract as convert_reference_state_dict)."""
    return _convert(sd, variables, _translate_generator, strict,
                    zero_fill=lambda coll, path: False)


# PointDiscriminator1 (point_discriminator.py:16-73): every layer is
# spectral-normed (torch parametrize keys). Module name map:
_DIS_MODULES = {
    "sa1.mlp_convs.0": "sa_conv0", "sa1.mlp_convs.1": "sa_conv1",
    "sa1.mlp_convs.2": "sa_conv2",
    "fc1": "fc0", "fc2": "fc1", "fc3": "fc2",
    "prob_head.0": "prob_head",
}


def convert_reference_discriminator(sd: Dict[str, Any],
                                    variables: Dict[str, Any], strict=True):
    """Map a reference PointDiscriminator1 state_dict onto our flax
    discriminator variables.

    torch ``parametrizations.weight.original`` is the RAW weight (the
    effective weight is ``original / sigma`` with sigma estimated by power
    iteration); flax.linen.SpectralNorm keeps the raw kernel in params and
    re-runs power iteration from the stored ``u`` each call, so the faithful
    mapping is: original -> kernel (transposed), ``_u`` -> u (as (1, out)),
    and sigma = u^T W v from the stored vectors (torch's eval-mode value;
    flax recomputes it anyway)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    report = ConversionReport()
    # flax SpectralNorm leaf NAMES contain slashes ('fc0/kernel/sigma'), so
    # flatten with tuple paths here instead of joined strings
    target_flat = {c: _flatten_tuples(variables.get(c, {})) for c in
                   ("params", "batch_stats")}
    out = {c: {} for c in target_flat}
    covered = {c: set() for c in target_flat}
    errors: List[str] = []

    def _leaf_path(coll, *, leaf_suffix=None, parts=None):
        if parts is not None:
            return parts if parts in target_flat[coll] else None
        hits = [p for p in target_flat[coll] if p[-1].endswith(leaf_suffix)]
        if len(hits) != 1:
            errors.append(f"{leaf_suffix}: {len(hits)} target matches")
            return None
        return hits[0]

    def _put(coll, path, src_key, val):
        if path is None or path not in target_flat[coll]:
            errors.append(f"{src_key} -> {coll}:{path} (no such target leaf)")
            return
        want = tuple(np.shape(target_flat[coll][path]))
        if tuple(val.shape) != want:
            errors.append(f"{src_key} -> {coll}:{path}: shape {val.shape} "
                          f"vs model {want}")
            return
        node = out[coll]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.array(val, dtype=np.float32, copy=True)
        covered[coll].add(path)
        report.mapped.append((src_key, f"{coll}:{'/'.join(path)}"))

    handled = set()
    for src, name in _DIS_MODULES.items():
        w_key = f"{src}.parametrizations.weight.original"
        u_key = f"{src}.parametrizations.weight.0._u"
        v_key = f"{src}.parametrizations.weight.0._v"
        b_key = f"{src}.bias"
        if w_key not in sd:
            continue
        w = np.asarray(sd[w_key], np.float32)
        mat = w.reshape(w.shape[0], -1)           # torch weight_mat (out, in)
        _put("params", _leaf_path("params", parts=(name, "kernel")),
             w_key, _dense_kernel(w))
        if b_key in sd:
            _put("params", _leaf_path("params", parts=(name, "bias")),
                 b_key, np.asarray(sd[b_key]))
            handled.add(b_key)
        handled.add(w_key)
        if u_key in sd and v_key in sd:
            u = np.asarray(sd[u_key], np.float32)
            v = np.asarray(sd[v_key], np.float32)
            sigma = float(u @ mat @ v)
            _put("batch_stats",
                 _leaf_path("batch_stats", leaf_suffix=f"{name}/kernel/u"),
                 u_key, u.reshape(1, -1))
            _put("batch_stats",
                 _leaf_path("batch_stats",
                            leaf_suffix=f"{name}/kernel/sigma"),
                 v_key, np.asarray(sigma, np.float32))
            handled.update((u_key, v_key))

    report.unhandled = [k for k in sd if k not in handled]
    report.errors = errors
    for coll, flat in target_flat.items():
        report.missing += [f"{coll}:{'/'.join(p)}" for p in flat
                           if p not in covered[coll]]
    if strict and (errors or report.unhandled or report.missing):
        raise ValueError(
            "reference discriminator conversion failed:\n  errors: "
            f"{errors[:10]}\n  unhandled: {report.unhandled[:10]}\n  "
            f"missing: {report.missing[:10]}\n  ({report.summary()})")
    new_vars = dict(variables)
    for coll in out:
        if target_flat[coll]:
            # overlay keeps init values for uncovered leaves (tolerant mode)
            new_vars[coll] = _overlay(variables.get(coll, {}), out[coll])
    return new_vars, report


def _flatten_tuples(tree, prefix=()) -> Dict[tuple, Any]:
    out = {}
    for k, v in tree.items():
        p = prefix + (str(k),)
        if isinstance(v, dict):
            out.update(_flatten_tuples(v, p))
        else:
            out[p] = v
    return out


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


def _zero_fill_model(coll: str, path: str) -> bool:
    """Target leaves our modules declare that the reference does not have:
    ZERO-filled (arithmetically identical — see module docstring)."""
    return (coll == "params" and path.startswith("prediction/LinearBlock")
            and path.endswith("Dense_0/bias"))


def _convert(sd, variables, translate, strict, zero_fill):
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    report = ConversionReport()
    target_flat = {c: _flatten(variables.get(c, {})) for c in
                   ("params", "batch_stats")}
    covered = {c: set() for c in target_flat}
    out = {c: {} for c in target_flat}

    errors: List[str] = []
    for key in sorted(sd):
        coll, path, tf = translate(key)
        if coll == "drop":
            report.dropped.append(key)
            continue
        if coll == "unhandled":
            report.unhandled.append(key)
            continue
        if path not in target_flat[coll]:
            errors.append(f"{key} -> {coll}:{path} (no such target leaf)")
            continue
        # copy=True: np.asarray on a live torch tensor returns a VIEW that
        # later in-place training steps would silently mutate
        val = np.array(sd[key], dtype=np.float32, copy=True)
        val = tf(val) if tf is not None else val
        want = tuple(np.shape(target_flat[coll][path]))
        if tuple(val.shape) != want:
            errors.append(f"{key} -> {coll}:{path}: shape {val.shape} "
                          f"vs model {want}")
            continue
        _set_path(out[coll], path, val)
        covered[coll].add(path)
        report.mapped.append((key, f"{coll}:{path}"))

    # zero-fill the documented bias gaps; anything else uncovered is an error
    for coll, flat in target_flat.items():
        for path, leaf in flat.items():
            if path in covered[coll]:
                continue
            if zero_fill(coll, path):
                _set_path(out[coll], path, np.zeros(np.shape(leaf), np.float32))
                report.zero_filled.append(path)
            else:
                report.missing.append(f"{coll}:{path}")

    report.errors = errors
    if strict and (errors or report.unhandled or report.missing):
        raise ValueError(
            "reference checkpoint conversion failed:\n  errors: "
            f"{errors[:10]}\n  unhandled: {report.unhandled[:10]}\n  "
            f"missing: {report.missing[:10]}\n  ({report.summary()})")

    new_vars = dict(variables)
    for coll in out:
        if target_flat[coll]:
            # overlay keeps init values for uncovered leaves (tolerant mode)
            new_vars[coll] = _overlay(variables.get(coll, {}), out[coll])
    return new_vars, report


def convert_reference_optimizer_state(opt_sd: Dict[str, Any],
                                      param_names: List[str],
                                      variables: Dict[str, Any],
                                      strict: bool = True):
    """Convert a reference torch Adam/AdamW ``optimizer.state_dict()`` into
    optax-shaped first/second-moment trees — mid-training migration.

    ``opt_sd``: ``{'state': {i: {'step', 'exp_avg', 'exp_avg_sq'}},
    'param_groups': [{'params': [i, ...]}, ...]}``; the integer indices
    enumerate the concatenation of the groups' param lists, which for the
    reference is ``model.parameters()`` order — pass the matching
    ``param_names`` (the model state_dict keys minus BN running stats /
    counters, which preserves registration order).
    ``variables``: our converted model variables (mu/nu take the params
    tree structure; leaves with no torch counterpart — the zero-filled
    head biases — get zero moments, which is exact: their torch gradient
    never existed and a zero-moment AdamW step leaves a zero bias zero).

    Moments are elementwise, so each tensor is routed and transposed
    exactly like its parameter. Returns ``(mu, nu, count)`` where count is
    the torch step counter (optax's ``scale_by_adam`` increments before
    the bias correction, matching torch's pre-incremented ``step``).
    """
    groups = opt_sd.get("param_groups", [])
    order: List[int] = []
    for g in groups:
        order += list(g["params"])
    if len(order) != len(param_names):
        raise ValueError(f"optimizer has {len(order)} params but "
                         f"{len(param_names)} names were derived")
    idx_to_name = {idx: param_names[pos] for pos, idx in enumerate(order)}

    params = variables["params"]
    target_flat = _flatten(params)
    mu_flat = {p: np.zeros(np.shape(v), np.float32)
               for p, v in target_flat.items()}
    nu_flat = {p: np.zeros(np.shape(v), np.float32)
               for p, v in target_flat.items()}
    sd_keys = set(param_names)
    count = 0
    errors: List[str] = []
    unhandled: List[str] = []
    for idx, st in opt_sd.get("state", {}).items():
        name = idx_to_name.get(int(idx))
        if name is None:
            errors.append(f"state index {idx} outside param_groups")
            continue
        coll, path, tf = _translate(name, sd_keys)
        if coll == "unhandled":
            unhandled.append(name)
            continue
        if coll != "params" or path not in target_flat:
            errors.append(f"{name} -> {coll}:{path} (not a param leaf)")
            continue
        count = max(count, int(np.asarray(st["step"])))
        for src, dst in (("exp_avg", mu_flat), ("exp_avg_sq", nu_flat)):
            # copy=True: live torch state tensors mutate on the next step
            val = np.array(st[src], dtype=np.float32, copy=True)
            val = tf(val) if tf is not None else val
            if val.shape != np.shape(target_flat[path]):
                errors.append(f"{name}.{src}: {val.shape} vs param "
                              f"{np.shape(target_flat[path])}")
                break
            dst[path] = val
    if strict and (errors or unhandled):
        raise ValueError("reference optimizer conversion failed:\n  errors: "
                         f"{errors[:10]}\n  unhandled: {unhandled[:10]}")

    def _unflatten(flat):
        tree: Dict[str, Any] = {}
        for p, v in flat.items():
            _set_path(tree, p, v)
        return tree

    return _unflatten(mu_flat), _unflatten(nu_flat), count


def splice_adam_state(opt_state, mu, nu, count):
    """Insert converted (mu, nu, count) into an optax optimizer state by
    replacing every ``ScaleByAdamState`` in the (possibly chained) state
    tuple. Works for optax.adam/adamw/chain(...) compositions."""
    import jax
    import jax.numpy as jnp
    import optax

    def _to_tree(template, tree):
        return jax.tree_util.tree_map(
            lambda t, v: jnp.asarray(v, t.dtype), template, tree)

    def walk(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(count=jnp.asarray(count, s.count.dtype),
                              mu=_to_tree(s.mu, mu), nu=_to_tree(s.nu, nu))
        if isinstance(s, tuple):
            # recurse through wrapper states too (InjectHyperparamsState /
            # MaskedState hold the adam state in an inner_state field)
            vals = [walk(x) for x in s]
            return type(s)(*vals) if hasattr(s, "_fields") else tuple(vals)
        if isinstance(s, dict):
            return {k: walk(v) for k, v in s.items()}
        return s

    return walk(opt_state)


def export_reference_state_dict(variables: Dict[str, Any], layout_rows,
                                strict: bool = True):
    """EXPORT our flax ``variables`` as a reference torch ``state_dict``
    (the inverse of :func:`convert_reference_state_dict`) — the migration
    escape hatch: a model trained here loads into the reference code.

    ``layout_rows``: the target reference layout as ``[key, shape]`` pairs
    (a ``tests/fixtures/ref_layout_*.json`` fixture, or the live
    ``[[k, list(v.shape)] for k, v in ref_model.state_dict().items()]``).
    The layout decides key set and tensor ranks (Conv2d vs Conv1d vs
    Linear); values come from ``variables`` through the same rule table as
    the import direction, inverted.

    Our ``LinearBlock`` Dense biases have no reference slot (the reference
    head Linears are bias-free); a constant pre-BN shift is absorbed
    exactly by the BN running mean in eval mode, so each such bias ``b``
    is FOLDED into its BatchNorm's exported ``running_mean`` (``mean - b``)
    instead of being dropped.

    Returns ``(state_dict, ConversionReport)`` with numpy float32 values
    (``num_batches_tracked`` as int64 zeros).
    """
    keys = {k for k, _ in layout_rows}
    return _export(variables, layout_rows, lambda k: _translate(k, keys),
                   strict, fold_bias=True)


def export_reference_generator(variables: Dict[str, Any], layout_rows,
                               strict: bool = True):
    """EXPORT our flax augmentor variables as a reference
    AdaptPoint_Augmentor state_dict (inverse of
    :func:`convert_reference_generator`; no bias-fold cases — every
    conv/bias slot exists on both sides)."""
    return _export(variables, layout_rows, _translate_generator, strict,
                   fold_bias=False)


def export_reference_discriminator(variables: Dict[str, Any], layout_rows,
                                   strict: bool = True):
    """EXPORT our flax discriminator as a reference PointDiscriminator1
    state_dict (inverse of :func:`convert_reference_discriminator`).

    flax SpectralNorm stores the raw kernel + the power-iteration ``u``;
    torch additionally stores ``_v``, which at the fixed point is
    ``normalize(W_mat^T u)`` — exported that way."""
    keys = {k for k, _ in layout_rows}
    flat_p = _flatten_tuples(variables.get("params", {}))
    flat_b = _flatten_tuples(variables.get("batch_stats", {}))
    u_by_name = {}
    for path, leaf in flat_b.items():
        if path[-1].endswith("/kernel/u"):
            u_by_name[path[-1][:-len("/kernel/u")]] = np.asarray(
                leaf, np.float32).reshape(-1)
    report = ConversionReport()
    out: Dict[str, Any] = {}
    errors: List[str] = []
    shapes = dict((k, s) for k, s in layout_rows)
    for src, name in _DIS_MODULES.items():
        w_key = f"{src}.parametrizations.weight.original"
        if w_key not in shapes:
            continue
        kern = flat_p.get((name, "kernel"))
        if kern is None:
            errors.append(f"{w_key}: no source kernel {name}")
            continue
        w = np.ascontiguousarray(np.asarray(kern, np.float32).T)  # (out,in)
        if int(np.prod(w.shape)) != int(np.prod(shapes[w_key])):
            errors.append(f"{w_key}: kernel {w.shape} vs layout "
                          f"{shapes[w_key]}")
            continue
        out[w_key] = w.reshape(shapes[w_key])
        report.mapped.append((f"params:{name}/kernel", w_key))
        b_key = f"{src}.bias"
        if b_key in shapes:
            bias = flat_p.get((name, "bias"))
            if bias is None:
                errors.append(f"{b_key}: no source bias {name}")
            else:
                out[b_key] = np.asarray(bias, np.float32)
                report.mapped.append((f"params:{name}/bias", b_key))
        u = u_by_name.get(name)
        if u is None:
            errors.append(f"{name}: no spectral-norm u in batch_stats")
            continue
        v = w.T @ u
        v = v / max(float(np.linalg.norm(v)), 1e-12)
        out[f"{src}.parametrizations.weight.0._u"] = u
        out[f"{src}.parametrizations.weight.0._v"] = v.astype(np.float32)
        report.mapped.append((f"batch_stats:{name}/kernel/u",
                              f"{src}.parametrizations.weight.0._u"))
    missing_keys = [k for k in shapes if k not in out]
    report.missing = missing_keys
    report.errors = errors
    if strict and (errors or missing_keys):
        raise ValueError(
            "reference discriminator export failed:\n  errors: "
            f"{errors[:10]}\n  missing: {missing_keys[:10]}\n  "
            f"({report.summary()})")
    return out, report


def _export(variables, layout_rows, translate, strict, fold_bias):
    keys = {k for k, _ in layout_rows}
    flat = {c: _flatten(variables.get(c, {})) for c in
            ("params", "batch_stats")}
    used = {c: set() for c in flat}
    report = ConversionReport()
    out: Dict[str, Any] = {}
    errors: List[str] = []
    for key, shape in layout_rows:
        coll, path, tf = translate(key)
        if coll == "drop":  # num_batches_tracked
            out[key] = np.asarray(0, np.int64)
            report.dropped.append(key)
            continue
        if coll == "unhandled":
            report.unhandled.append(key)
            continue
        if path not in flat[coll]:
            errors.append(f"{key} <- {coll}:{path} (no such source leaf)")
            continue
        val = np.asarray(flat[coll][path], np.float32)
        if tf is _dense_kernel:
            val = np.ascontiguousarray(val.T)     # (in,out) -> (out,in)
        elif tf is _conv2d_kernel:
            val = np.ascontiguousarray(           # (kh,kw,I,O) -> (O,I,kh,kw)
                np.transpose(val, (3, 2, 0, 1)))
        if int(np.prod(val.shape)) != int(np.prod(shape)):
            errors.append(f"{key} <- {coll}:{path}: size {val.shape} "
                          f"vs layout {shape}")
            continue
        # BN running_mean with a bias-free reference conv sibling: fold our
        # Dense bias (if any) into the exported mean (exact in eval mode)
        if fold_bias and coll == "batch_stats" \
                and key.endswith(".1.running_mean"):
            conv_bias_key = key[:-len(".1.running_mean")] + ".0.bias"
            dense_bias = path.replace("/NormAct_0/BatchNorm_0/mean",
                                      "/Dense_0/bias")
            if conv_bias_key not in keys and dense_bias in flat["params"]:
                val = val - np.asarray(flat["params"][dense_bias],
                                       np.float32)
                used["params"].add(dense_bias)
                report.zero_filled.append(dense_bias)  # folded, not lost
        out[key] = val.reshape(shape)
        used[coll].add(path)
        report.mapped.append((f"{coll}:{path}", key))

    # a source leaf with no layout slot means trained weights would be
    # silently dropped from the .pth — surface it (strict: fail)
    report.errors = errors
    for coll, leaves in flat.items():
        report.missing += [f"{coll}:{p}" for p in leaves
                           if p not in used[coll]]
    if strict and (errors or report.unhandled or report.missing):
        raise ValueError(
            "reference checkpoint export failed:\n  errors: "
            f"{errors[:10]}\n  unhandled: {report.unhandled[:10]}\n  "
            f"uncovered source leaves: {report.missing[:10]}\n  "
            f"({report.summary()})")
    return out, report


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
    keys = set(sd.keys()) | {k[len("module."):] for k in sd
                             if k.startswith("module.")}
    return _convert(sd, variables, lambda k: _translate(k, keys),
                    strict, _zero_fill_model)
