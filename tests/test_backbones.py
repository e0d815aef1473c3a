"""Smoke tests for the secondary backbones (PointNet++, PointNet, PointMLP)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptpoint_tpu.models.build import MODELS


@pytest.fixture
def inputs(rng_np):
    pos = jnp.asarray(rng_np.standard_normal((2, 128, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    return pos, x


def test_pointnet2_encoder(inputs):
    pos, x = inputs
    enc = MODELS.build({
        "NAME": "PointNet2Encoder", "in_channels": 4,
        "mlps": [[[64, 64, 128]], [[128, 128, 256]], [[256, 512, 1024]]],
        "radius": [0.2, 0.4, None], "num_samples": [32, 64, None],
        "strides": [4, 4, 1],
        "group_args": {"NAME": "ballquery"}, "norm_args": {"norm": "bn"},
        "act_args": {"act": "relu"}})
    assert enc.out_channels == 1024
    v = enc.init(jax.random.PRNGKey(0), pos, x, training=False,
                 method="forward_cls_feat")
    out = enc.apply(v, pos, x, training=False, method="forward_cls_feat")
    assert out.shape == (2, 1024)


@pytest.mark.slow
def test_pointnet_encoder(inputs):
    pos, x = inputs
    enc = MODELS.build({"NAME": "PointNetEncoder", "in_channels": 4,
                        "input_transform": True, "feature_transform": True})
    v = enc.init(jax.random.PRNGKey(0), pos, x, training=False,
                 method="forward_cls_feat")
    out = enc.apply(v, pos, x, training=False, method="forward_cls_feat")
    assert out.shape == (2, 1024)
    # T-Net init at identity: first forward equals no-transform path closely
    _, seg = enc.apply(v, pos, x, training=False, method="forward_seg_feat")
    assert seg.shape == (2, 128, 1024 + 64)


@pytest.mark.slow
def test_pointmlp_encoder(inputs):
    pos, x = inputs
    enc = MODELS.build({"NAME": "PointMLPEncoder", "in_channels": 4,
                        "embed_dim": 16,
                        "dim_expansion": [2, 2], "pre_blocks": [1, 1],
                        "pos_blocks": [1, 1], "k_neighbors": [8, 8],
                        "reducers": [2, 2]})
    assert enc.out_channels == 64
    v = enc.init(jax.random.PRNGKey(0), pos, x, training=False,
                 method="forward_cls_feat")
    out = enc.apply(v, pos, x, training=False, method="forward_cls_feat")
    assert out.shape == (2, 64)


def test_basecls_with_pointnet2(inputs):
    pos, x = inputs
    from adaptpoint_tpu.models import build_model_from_cfg
    model = build_model_from_cfg({
        "NAME": "BaseCls",
        "encoder_args": {
            "NAME": "PointNet2Encoder", "in_channels": 4,
            "mlps": [[[64, 64, 128]], [[128, 128, 256]], [[256, 512, 1024]]],
            "radius": [0.2, 0.4, None], "num_samples": [32, 64, None],
            "strides": [4, 4, 1], "norm_args": {"norm": "bn"}},
        "cls_args": {"NAME": "ClsHead", "num_classes": 15, "mlps": [512, 256],
                     "norm_args": {"norm": "bn1d"}}})
    v = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    out = model.apply(v, pos, x, training=False)
    assert out.shape == (2, 15)


@pytest.mark.slow
def test_pointvit(inputs):
    pos, x = inputs
    enc = MODELS.build({"NAME": "PointViT", "in_channels": 4,
                        "embed_dim": 32, "depth": 2, "num_heads": 4,
                        "num_groups": 16, "group_size": 8})
    assert enc.out_channels == 64
    v = enc.init(jax.random.PRNGKey(0), pos, x, training=False,
                 method="forward_cls_feat")
    out = enc.apply(v, pos, x, training=False, method="forward_cls_feat")
    assert out.shape == (2, 64)


@pytest.mark.slow
def test_deepgcn(inputs):
    pos, x = inputs
    enc = MODELS.build({"NAME": "DeepGCN", "in_channels": 4, "channels": 8,
                        "emb_dims": 32, "n_blocks": 4, "k": 6})
    assert enc.out_channels == 64
    v = enc.init(jax.random.PRNGKey(0), pos, x, training=False,
                 method="forward_cls_feat")
    out = enc.apply(v, pos, x, training=False, method="forward_cls_feat")
    assert out.shape == (2, 64)


@pytest.mark.slow
def test_curvenet(rng_np):
    pos = jnp.asarray(rng_np.standard_normal((2, 256, 3)), jnp.float32)
    cls0 = jnp.zeros((2,), jnp.int32)
    m = MODELS.build({"NAME": "CurveNet", "num_classes": 50, "category": 16,
                      "k": 8})
    v = m.init({"params": jax.random.PRNGKey(0),
                "curve": jax.random.PRNGKey(1)}, pos, None, cls0,
               training=False)
    out = m.apply(v, pos, None, cls0, training=False)
    assert out.shape == (2, 256, 50)


@pytest.mark.slow
def test_pointtransformer(rng_np):
    pos = jnp.asarray(rng_np.standard_normal((2, 256, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1)
    enc = MODELS.build({"NAME": "PointTransformerEncoder", "in_channels": 4,
                        "blocks": [1, 1, 1], "planes": [16, 32, 64],
                        "strides": [1, 4, 4], "nsample": [8, 8, 8]})
    assert enc.out_channels == 64
    v = enc.init(jax.random.PRNGKey(0), pos, x, training=False,
                 method="forward_cls_feat")
    out = enc.apply(v, pos, x, training=False, method="forward_cls_feat")
    assert out.shape == (2, 64)


@pytest.mark.slow
def test_simpleview(rng_np):
    pos = jnp.asarray(rng_np.standard_normal((2, 128, 3)), jnp.float32)
    m = MODELS.build({"NAME": "MVModel", "num_classes": 15, "channels": 4,
                      "resolution": 32})
    v = m.init(jax.random.PRNGKey(0), pos, training=False)
    out = m.apply(v, pos, training=False)
    assert out.shape == (2, 15)


@pytest.mark.slow
def test_randlanet(rng_np):
    pos = jnp.asarray(rng_np.standard_normal((2, 256, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1)
    m = MODELS.build({"NAME": "RandLANet", "d_in": 4, "num_neighbors": 8,
                      "dims": [8, 16, 32, 64]})
    v = m.init(jax.random.PRNGKey(0), pos, x, training=False)
    p, h = m.apply(v, pos, x, training=False)
    assert h.shape[:2] == (2, 256)  # per-point features at full resolution
    out = m.apply(v, pos, x, training=False, method="forward_cls_feat")
    assert out.shape == (2, 128)


def test_ball_dgcnn_variant(inputs):
    pos, x = inputs
    enc = MODELS.build({"NAME": "DGCNN", "in_channels": 4, "channels": 8,
                        "embed_dim": 32, "n_blocks": 3, "k": 8,
                        "graph": "ball", "radius": 0.5})
    v = enc.init(jax.random.PRNGKey(0), pos, x, training=False,
                 method="forward_cls_feat")
    out = enc.apply(v, pos, x, training=False, method="forward_cls_feat")
    assert out.shape == (2, 64)


def test_grouppointnet(inputs):
    pos, x = inputs
    m = MODELS.build({"NAME": "GroupPointNet", "in_channels": 4,
                      "channels": 16, "n_blocks": 4,
                      "group_args": {"NAME": "knn", "nsample": 8}})
    v = m.init(jax.random.PRNGKey(0), pos, x, training=False,
               method="forward_cls_feat")
    out = m.apply(v, pos, x, training=False, method="forward_cls_feat")
    assert out.shape == (2, 32)


@pytest.mark.slow
def test_baafnet(rng_np):
    pos = jnp.asarray(rng_np.standard_normal((2, 256, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1)
    m = MODELS.build({"NAME": "BAAFNet", "num_classes": 13,
                      "dims": [4, 8, 16, 64, 128], "k": 8})
    v = m.init({"params": jax.random.PRNGKey(0)}, pos, x)
    out = m.apply(v, pos, x)  # eval: no dropout rng needed
    assert out.shape == (2, 256, 13)
    out2, _ = m.apply(v, pos, x, True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert jnp.isfinite(out2).all()


@pytest.mark.slow
def test_stratified_window_keys_match_bruteforce(rng_np):
    """The hashed-bucket key sets must reproduce get_indice_pairs semantics:
    fine pairs = same fine window; stratified keys = downsampled points in
    the same 2x coarse window but a different fine window."""
    from adaptpoint_tpu.models.backbone.stratified_transformer import (
        _stratified_keys, _window_coords)
    xyz = jnp.asarray(rng_np.random((1, 64, 3)) * 2.0, jnp.float32)
    ws = 0.5
    ds_idx = jnp.asarray(rng_np.choice(64, 16, replace=False)[None],
                         jnp.int32)
    key_idx, key_mask = _stratified_keys(
        xyz, ws, shifted=False, ds_idx=ds_idx, num_buckets=64, capacity=64,
        ds_capacity=16)
    wc = np.asarray(_window_coords(xyz, ws, False))[0]
    cwc = np.asarray(_window_coords(xyz, 2 * ws, False))[0]
    is_ds = np.zeros(64, bool)
    is_ds[np.asarray(ds_idx)[0]] = True
    ki, km = np.asarray(key_idx)[0], np.asarray(key_mask)[0]
    for i in range(64):
        got = set(ki[i][km[i]].tolist())
        fine = {j for j in range(64) if (wc[j] == wc[i]).all()}
        strat = {j for j in range(64)
                 if is_ds[j] and (cwc[j] == cwc[i]).all()
                 and not (wc[j] == wc[i]).all()}
        assert got == fine | strat, (i, got, fine | strat)


@pytest.mark.slow
def test_stratified_transformer(rng_np):
    from adaptpoint_tpu.models import build_model_from_cfg
    m = build_model_from_cfg({
        "NAME": "StratifiedTransformer", "num_classes": 13,
        "encoder_args": {"in_channels": 4, "channels": [16, 32],
                         "depths": [2, 2], "num_heads": [2, 4],
                         "window_size": 0.8, "quant_size": 0.05,
                         "grid_size": 0.2, "num_buckets": 32,
                         "capacity": 16, "ds_capacity": 8}})
    xyz = jnp.asarray(rng_np.random((2, 128, 3)) * 4, jnp.float32)
    x = jnp.concatenate([xyz, xyz[..., 2:3]], -1)
    v = m.init({"params": jax.random.PRNGKey(0)}, xyz, x, True)
    out, _ = m.apply(v, xyz, x, True, mutable=["batch_stats"])
    assert out.shape == (2, 128, 13) and bool(jnp.isfinite(out).all())
    g = jax.grad(lambda p: m.apply({**v, "params": p}, xyz, x, True,
                                   mutable=["batch_stats"])[0].sum()
                 )(v["params"])
    assert all(bool(jnp.isfinite(a).all()) for a in jax.tree.leaves(g))


def test_pointbert(rng_np):
    from adaptpoint_tpu.models import build_model_from_cfg
    m = build_model_from_cfg({"NAME": "PointBERT", "num_classes": 15,
                              "embed_dim": 64, "depth": 2, "num_heads": 4,
                              "encoder_dims": 64, "num_groups": 32,
                              "group_size": 8})
    pts = jnp.asarray(rng_np.standard_normal((2, 256, 3)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, pts, training=False)
    assert m.apply(v, pts, training=False).shape == (2, 15)
    feat = m.apply(v, pts, training=False, method="forward_cls_feat")
    assert feat.shape == (2, 128)  # [cls || max-token]


@pytest.mark.slow
def test_vitgraph_and_resnet2d(rng_np):
    from adaptpoint_tpu.models import build_model_from_cfg
    xyz = jnp.asarray(rng_np.standard_normal((2, 128, 3)), jnp.float32)
    for emb in ("groupembed", "kmeans"):
        m = build_model_from_cfg({"NAME": "ViTGraph", "encoder_dim": 64,
                                  "depth": 2, "num_heads": 4,
                                  "embed_args": {"NAME": emb, "num_groups": 16,
                                                 "group_size": 8,
                                                 "embed_dim": 32}})
        v = m.init({"params": jax.random.PRNGKey(0)}, xyz, training=False)
        c, h = m.apply(v, xyz, training=False)
        assert c.shape == (2, 16, 3) and h.shape == (2, 17, 64), emb
    m = build_model_from_cfg({"NAME": "ResNet", "block": "basic",
                              "layers": [1, 1, 1, 1], "num_classes": 10})
    img = jnp.asarray(rng_np.standard_normal((2, 32, 32, 3)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, img, training=False)
    assert m.apply(v, img, training=False).shape == (2, 10)
