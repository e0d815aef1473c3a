"""Model smoke + parity tests (shapes, param counts vs reference cfg headers)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def pointnext_cfg():
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, "cfgs/scanobjectnn/pointnext-s.yaml"), recursive=True)
    return cfg


def test_pointnext_s_forward_and_params(pointnext_cfg):
    model = build_model_from_cfg(pointnext_cfg.model)
    B, N = 2, 128
    rng = np.random.default_rng(0)
    pos = jnp.array(rng.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    logits = model.apply(variables, pos, x, training=False)
    assert logits.shape == (B, 15)
    # parity: reference cfg header says 1.367M params
    # (cfgs/scanobjectnn/pointnext-s.yaml:1-2)
    total = n_params(variables["params"])
    assert abs(total - 1.367e6) / 1.367e6 < 0.02, f"params {total}"


def test_pointnext_s_train_mode_batchstats(pointnext_cfg):
    model = build_model_from_cfg(pointnext_cfg.model)
    B, N = 2, 128
    rng = np.random.default_rng(1)
    pos = jnp.array(rng.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    logits, updates = model.apply(
        variables, pos, x, training=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])
    assert logits.shape == (B, 15)
    assert "batch_stats" in updates
    # batch stats actually moved
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_dgcnn_forward():
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, "cfgs/scanobjectnn/dgcnn.yaml"), recursive=True)
    model = build_model_from_cfg(cfg.model)
    B, N = 2, 64
    rng = np.random.default_rng(0)
    pos = jnp.array(rng.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    logits = model.apply(variables, pos, x, training=False)
    assert logits.shape == (B, 15)


def test_pointnext_encoder_seg_feat(pointnext_cfg):
    enc_cfg = dict(pointnext_cfg.model.encoder_args)
    from adaptpoint_tpu.models.build import MODELS
    enc = MODELS.build(enc_cfg)
    B, N = 2, 128
    rng = np.random.default_rng(0)
    pos = jnp.array(rng.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = enc.init(jax.random.PRNGKey(0), pos, x, training=False,
                         method="forward_seg_feat")
    ps, fs = enc.apply(variables, pos, x, training=False,
                       method="forward_seg_feat")
    # strides [1,2,2,2,2,1] -> N, N, N/2, N/4, N/8, N/16, N/16
    assert [p.shape[1] for p in ps] == [N, N, N // 2, N // 4, N // 8, N // 16, N // 16]
    widths = [f.shape[-1] for f in fs[1:]]
    assert widths == [32, 64, 128, 256, 512, 512]


def test_pointnext_with_depth_blocks(rng_np):
    """blocks > 1 exercises the InvResMLP path (PointNeXt-B/L/XL style)."""
    from adaptpoint_tpu.models.build import MODELS
    enc = MODELS.build({
        "NAME": "PointNextEncoder",
        "blocks": [1, 2, 2], "strides": [1, 2, 2], "width": 16,
        "in_channels": 4, "sa_layers": 1, "sa_use_res": False,
        "radius": 0.15, "radius_scaling": 1.5, "nsample": 8, "expansion": 4,
        "aggr_args": {"feature_type": "dp_fj", "reduction": "max"},
        "group_args": {"NAME": "ballquery", "normalize_dp": True},
        "conv_args": {"order": "conv-norm-act"},
        "act_args": {"act": "relu"}, "norm_args": {"norm": "bn"}})
    pos = jnp.asarray(np.random.default_rng(3).standard_normal((2, 128, 3)),
                      jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1)
    v = enc.init(jax.random.PRNGKey(0), pos, x, training=False,
                 method="forward_seg_feat")
    ps, fs = enc.apply(v, pos, x, training=False, method="forward_seg_feat")
    assert [p.shape[1] for p in ps] == [128, 128, 64, 32]
    assert [f.shape[-1] for f in fs[1:]] == [16, 32, 64]


def test_eval_bf16_dpfj_matches_f32_argmax(rng_np, monkeypatch):
    """Eval-mode bf16 dpfj storage (ADAPTPOINT_TPU_EVAL_DPFJ) must not flip
    predictions vs the bit-exact f32 path on a trained-scale model."""
    import os
    import jax
    import jax.numpy as jnp
    from adaptpoint_tpu.models import build_model_from_cfg

    model = build_model_from_cfg({
        "NAME": "BaseCls",
        "encoder_args": {
            "NAME": "PointNextEncoder", "blocks": [1, 1, 1, 1],
            "strides": [1, 2, 2, 1], "width": 16, "in_channels": 4,
            "sa_layers": 2, "sa_use_res": True, "radius": 0.15,
            "radius_scaling": 1.5, "nsample": 8,
            "aggr_args": {"feature_type": "dp_fj", "reduction": "max"},
            "group_args": {"NAME": "ballquery", "normalize_dp": True},
            "norm_args": {"norm": "bn"}},
        "cls_args": {"NAME": "ClsHead", "num_classes": 5, "mlps": [32],
                     "norm_args": {"norm": "bn1d"}}})
    pos = jnp.asarray(rng_np.standard_normal((4, 128, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1)
    v = model.init(jax.random.PRNGKey(0), pos, x, training=False)

    monkeypatch.setenv("ADAPTPOINT_TPU_EVAL_DPFJ", "f32")
    exact = model.apply(v, pos, x, training=False)
    monkeypatch.setenv("ADAPTPOINT_TPU_EVAL_DPFJ", "bf16")
    fast = model.apply(v, pos, x, training=False)
    assert (jnp.argmax(exact, -1) == jnp.argmax(fast, -1)).all()
    # logits agree to activation-grade rounding
    assert float(jnp.max(jnp.abs(exact - fast))) < 0.15
