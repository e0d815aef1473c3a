#!/usr/bin/env python
"""Dump reference (torch) state_dict layouts as JSON fixtures.

Builds the reference models on CPU torch (the reference's CUDA extension
modules are stubbed — only ``__init__``-time structure is needed, no
forward) and records ``[key, shape]`` pairs into
``tests/fixtures/ref_layout_<name>.json``. These fixtures are DATA about
the reference architecture (no reference code is copied); they pin the
torch->flax checkpoint converter (adaptpoint_tpu/utils/torch_convert.py)
against the authoritative layouts:

- pointnext_s_cls      BaseCls  (cfgs/scanobjectnn/pointnext-s.yaml)
- pointnext_b_cls      BaseCls  with InvResMLP stages (PointNeXt-B protocol)
- pointnext_xl_s3dis   BaseSeg  (PointNextDecoder + SegHead, S3DIS XL)
- pointnext_s_partseg  BasePartSeg (PointNextPartDecoder cls_map=curvenet)
- pointnet2_cls        BaseCls  with PointNet2Encoder
- dgcnn_cls            BaseCls  with DGCNN encoder
- adaptpoint_gan       {generator, discriminator} as saved by the reference
                       trainer's save_ganmodel (train_autoaug.py:71-78)

Run:  python scripts/dump_ref_layouts.py [--ref /root/reference] [--only name]
"""
import argparse
import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _StubModule(types.ModuleType):
    """Permissive stub for reference deps unused at module-build time."""

    def __getattr__(self, k):
        if k.startswith("__") and k.endswith("__"):
            raise AttributeError(k)

        def f(*a, **kw):
            return None
        f.__name__ = k
        return f


class _EasyDict(dict):
    """Functional stand-in for easydict.EasyDict (attr access, recursive)."""

    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in {**(d or {}), **kw}.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _EasyDict):
            v = _EasyDict(v)
        super().__setitem__(k, v)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


def _import_reference(ref_root):
    # SimpleView's PCViews calls .cuda() at __init__ (simpleview_util.py
    # :250-252); on the CPU dump box make it a no-op
    import torch
    torch.Tensor.cuda = lambda self, *a, **kw: self
    for name in ("multimethod", "shortuuid",
                 "pointnet2_batch_cuda", "chamfer", "emd_cuda",
                 "pointops_cuda"):
        if name not in sys.modules:
            sys.modules[name] = _StubModule(name)
    easydict = types.ModuleType("easydict")
    easydict.EasyDict = _EasyDict
    sys.modules.setdefault("easydict", easydict)
    sys.path.insert(0, ref_root)
    import openpoints.models as ref_models          # noqa: F401
    import openpoints.models_adaptpoint as ref_gan  # noqa: F401
    # backbones the reference never wires into backbone/__init__.py but
    # ships registered (vestigial files, SURVEY §2): import so their
    # @MODELS.register_module() decorators run
    import openpoints.models.backbone.ball_dgcnn   # noqa: F401
    import openpoints.models.backbone.grouppointnet  # noqa: F401
    return ref_models, ref_gan


# Model args mirror the cfg files under cfgs/ (which themselves mirror the
# reference protocol); kept inline so the dump is self-contained.
_ENC_COMMON = dict(
    NAME="PointNextEncoder", width=32, in_channels=4, radius=0.15,
    radius_scaling=1.5, nsample=32, expansion=4, sa_layers=2, sa_use_res=True,
    aggr_args={"feature_type": "dp_fj", "reduction": "max"},
    group_args={"NAME": "ballquery", "normalize_dp": True},
    conv_args={"order": "conv-norm-act"},
    act_args={"act": "relu"}, norm_args={"norm": "bn"},
)

SPECS = {
    "pointnext_s_cls": dict(
        NAME="BaseCls",
        encoder_args=dict(_ENC_COMMON, blocks=[1, 1, 1, 1, 1, 1],
                          strides=[1, 2, 2, 2, 2, 1]),
        cls_args={"NAME": "ClsHead", "num_classes": 15, "mlps": [512, 256],
                  "norm_args": {"norm": "bn1d"}},
    ),
    # PointNeXt-B protocol: multi-block stages -> InvResMLP keys
    "pointnext_b_cls": dict(
        NAME="BaseCls",
        encoder_args=dict(_ENC_COMMON, blocks=[1, 2, 3, 2, 1, 1],
                          strides=[1, 2, 2, 2, 2, 1],
                          sa_layers=1, sa_use_res=False),
        cls_args={"NAME": "ClsHead", "num_classes": 15, "mlps": [512, 256],
                  "norm_args": {"norm": "bn1d"}},
    ),
    "pointnext_xl_s3dis": dict(
        NAME="BaseSeg",
        encoder_args=dict(_ENC_COMMON, blocks=[1, 4, 7, 4, 4],
                          strides=[1, 4, 4, 4, 4], width=64,
                          radius=0.1, radius_scaling=2.0,
                          sa_layers=1, sa_use_res=False),
        decoder_args={"NAME": "PointNextDecoder"},
        cls_args={"NAME": "SegHead", "num_classes": 13, "in_channels": None,
                  "norm_args": {"norm": "bn"}},
    ),
    "pointnext_s_partseg": dict(
        NAME="BasePartSeg",
        encoder_args=dict(_ENC_COMMON, blocks=[1, 1, 1, 1, 1],
                          strides=[1, 2, 2, 2, 2],
                          radius=0.1, radius_scaling=2.0),
        decoder_args={"NAME": "PointNextPartDecoder", "cls_map": "curvenet"},
        cls_args={"NAME": "SegHead", "num_classes": 50, "in_channels": None,
                  "mlps": [128], "norm_args": {"norm": "bn"}},
    ),
    # cfgs/scanobjectnn/pointnet++.yaml (model-zoo protocol)
    "pointnet2_cls": dict(
        NAME="BaseCls",
        encoder_args={
            "NAME": "PointNet2Encoder", "in_channels": 4,
            "mlps": [[[64, 64, 128]], [[128, 128, 256]], [[256, 512, 1024]]],
            "radius": [0.2, 0.4, None], "num_samples": [32, 64, None],
            "strides": [4, 4, 1],
            "aggr_args": {"feature_type": "dp_fj", "reduction": "max"},
            "group_args": {"NAME": "ballquery"},
            "conv_args": {"order": "conv-norm-act"},
            "act_args": {"act": "relu"}, "norm_args": {"norm": "bn"}},
        cls_args={"NAME": "ClsHead", "num_classes": 15, "mlps": [512, 256],
                  "norm_args": {"norm": "bn1d"}},
    ),
    # GroupPointNet (grouppointnet.py:11: one FPS + grouping + conv2d
    # stack; its default group_args' 'group' key is ignored by
    # create_grouper -> ball query r=0.1)
    "grouppointnet_cls": dict(
        NAME="BaseCls",
        encoder_args={"NAME": "GroupPointNet", "in_channels": 3,
                      "channels": 16, "n_blocks": 4, "sample_ratio": 0.25,
                      "group_args": {"group": "knn", "radius": 0.4,
                                     "nsample": 8}},
        cls_args={"NAME": "ClsHead", "num_classes": 15, "mlps": [64],
                  "norm_args": {"norm": "bn1d"}},
    ),
    # BallDGCNN (ball_dgcnn.py:13: static ball-query graph, conv-act-norm
    # blocks, concat-all fusion)
    "balldgcnn_cls": dict(
        NAME="BaseCls",
        encoder_args={"NAME": "BallDGCNN", "in_channels": 4, "channels": 16,
                      "embed_dim": 32, "n_blocks": 4, "k": 8,
                      "radius": 0.4},
        # reference BallDGCNN defines no out_channels attr, so the head's
        # in_channels (max||avg = 2*embed_dim) must be explicit
        cls_args={"NAME": "ClsHead", "num_classes": 15, "mlps": [64],
                  "in_channels": 64, "norm_args": {"norm": "bn1d"}},
    ),
    # DeepGCN (reference deepgcn.py:13 defaults scaled down: res blocks,
    # dilated dynamic kNN, concat-all fusion)
    "deepgcn_cls": dict(
        NAME="BaseCls",
        encoder_args={"NAME": "DeepGCN", "in_channels": 4, "channels": 16,
                      "emb_dims": 32, "n_blocks": 4, "k": 4,
                      "use_stochastic": False},
        cls_args={"NAME": "ClsHead", "num_classes": 15, "mlps": [64],
                  "norm_args": {"norm": "bn1d"}},
    ),
    # PointViT (cfgs/scanobjectnn/pointvit.yaml protocol, reference
    # pointvit.py:17 — reference embed ignores num_groups and uses
    # sample_ratio, group_embed.py:65-82)
    "pointvit_cls": dict(
        NAME="BaseCls",
        encoder_args={
            "NAME": "PointViT", "in_channels": 4, "embed_dim": 48,
            "depth": 2, "num_heads": 3,
            "embed_args": {"NAME": "PointPatchEmbed", "sample_ratio": 0.0625,
                           "group_size": 8, "subsample": "fps",
                           "group": "knn", "feature_type": "fj",
                           "norm_args": {"norm": "in2d"}}},
        cls_args={"NAME": "ClsHead", "num_classes": 15, "mlps": [512, 256],
                  "norm_args": {"norm": "bn1d"}},
    ),
    # SimpleView (simpleview.py:61 MVModel: 6-view depth render +
    # channels-16 resnet18 trunk + MVFC)
    "simpleview_cls": dict(
        NAME="MVModel", task="cls", backbone="resnet18", channels=16,
        num_classes=15, resolution=128,
    ),
    # cfgs/scanobjectnn/pointnet.yaml (model-zoo protocol,
    # docs/modelzoo.md:13 — 3.5M params, STN + feature STN)
    "pointnet_cls": dict(
        NAME="BaseCls",
        encoder_args={"NAME": "PointNetEncoder", "in_channels": 4,
                      "input_transform": True, "feature_transform": True},
        cls_args={"NAME": "ClsHead", "num_classes": 15, "mlps": [512, 256],
                  "norm_args": {"norm": "bn1d"}},
    ),
    # cfgs/scanobjectnn/pointmlp.yaml (model-zoo protocol,
    # docs/modelzoo.md:15 — 13.2M params)
    "pointmlp_cls": dict(
        NAME="BaseCls",
        encoder_args={"NAME": "PointMLPEncoder", "in_channels": 4,
                      "embed_dim": 64, "res_expansion": 1.0,
                      "dim_expansion": [2, 2, 2, 2],
                      "pre_blocks": [2, 2, 2, 2], "pos_blocks": [2, 2, 2, 2],
                      "k_neighbors": [24, 24, 24, 24],
                      "reducers": [2, 2, 2, 2]},
        cls_args={"NAME": "ClsHead", "num_classes": 15, "mlps": [512, 256],
                  "norm_args": {"norm": "bn1d"}},
    ),
    # cfgs/scanobjectnn/dgcnn.yaml (model-zoo protocol)
    "dgcnn_cls": dict(
        NAME="BaseCls",
        encoder_args={"NAME": "DGCNN", "in_channels": 4, "channels": 64,
                      "embed_dim": 1024, "k": 20, "n_blocks": 5,
                      "conv_args": {"order": "conv-norm-act"},
                      "act_args": {"act": "leakyrelu", "negative_slope": 0.2},
                      "norm_args": {"norm": "bn"}},
        cls_args={"NAME": "ClsHead", "num_classes": 15, "mlps": [512, 256],
                  "norm_args": {"norm": "bn1d"}},
    ),
}

GAN_SPECS = {
    # cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml:54-65
    "generator": {"NAME": "AdaptPoint_Augmentor", "w_num_anchor": 4,
                  "w_sigma": 0.5, "w_R_range": 10, "w_S_range": 3,
                  "w_T_range": 0.25},
    "discriminator": {"NAME": "PointDiscriminator1", "num_classes": 15,
                      "normal_channel": False},
}


def _attrdict(d):
    """Recursive attr-dict over specs (lists recursed too); reuses the
    _EasyDict the easydict stub ships."""
    if isinstance(d, dict):
        return _EasyDict({k: _attrdict(v) for k, v in d.items()})
    if isinstance(d, list):
        return [_attrdict(v) for v in d]
    return d


def _layout(sd):
    return [[k, list(v.shape)] for k, v in sd.items()]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "fixtures"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args(argv)

    _import_reference(args.ref)
    from openpoints.models import build_model_from_cfg
    from openpoints.models_adaptpoint import build_adaptpointmodels_from_cfg

    os.makedirs(args.out, exist_ok=True)
    for name, spec in SPECS.items():
        if args.only and name != args.only:
            continue
        model = build_model_from_cfg(_attrdict(spec))
        layout = _layout(model.state_dict())
        path = os.path.join(args.out, f"ref_layout_{name}.json")
        json.dump(layout, open(path, "w"), indent=0)
        print(f"{name}: {len(layout)} keys -> {path}")

    if not args.only or args.only == "adaptpoint_gan":
        pair = {}
        for part, spec in GAN_SPECS.items():
            m = build_adaptpointmodels_from_cfg(_attrdict(spec))
            pair[part] = _layout(m.state_dict())
        path = os.path.join(args.out, "ref_layout_adaptpoint_gan.json")
        json.dump(pair, open(path, "w"), indent=0)
        print(f"adaptpoint_gan: G={len(pair['generator'])} "
              f"D={len(pair['discriminator'])} keys -> {path}")


if __name__ == "__main__":
    main()
