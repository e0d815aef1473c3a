"""Fused eval-mode SA kernel (ops/pallas/saeval.py) — CPU interpreter tier.

The TPU golden at the real PointNeXt-S shapes lives in
tests/test_tpu_kernels.py; this tier proves the flax integration
(param-tree identity, BN folding, skip/act ordering) without hardware.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.utils.fastpath import fused_eval


def _tiny_cls_cfg():
    return EasyConfig({
        "NAME": "BaseCls",
        "in_channels": 4,
        "encoder_args": {
            "NAME": "PointNextEncoder",
            "blocks": [1, 1, 1], "strides": [1, 2, 2], "width": 16,
            "in_channels": 4, "sa_layers": 2, "sa_use_res": True,
            "radius": 0.3, "radius_scaling": 1.5, "nsample": 8,
            "expansion": 4,
            "aggr_args": {"feature_type": "dp_fj", "reduction": "max"},
            "group_args": {"NAME": "ballquery", "normalize_dp": True},
            "conv_args": {"order": "conv-norm-act"},
            "act_args": {"act": "relu"},
            "norm_args": {"norm": "bn"},
        },
        "cls_args": {"NAME": "ClsHead", "num_classes": 5,
                     "mlps": [32], "norm_args": {"norm": "bn1d"}},
    })


@pytest.mark.slow
def test_fused_eval_matches_unfused(monkeypatch):
    """fused_eval() forward == the plain eval forward (same param tree,
    BN folded) to bf16 activation grade; param trees are identical."""
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("ADAPTPOINT_TPU_KERNELS", raising=False)
    called = []
    import adaptpoint_tpu.ops.pallas.saeval as saeval
    orig = saeval.sa_eval_pallas
    monkeypatch.setattr(saeval, "sa_eval_pallas",
                        lambda *a, **k: called.append(1) or orig(*a, **k))
    model = build_model_from_cfg(_tiny_cls_cfg())
    rng = np.random.default_rng(0)
    B, N = 2, 128
    pos = jnp.asarray(rng.standard_normal((B, N, 3)) * 0.4, jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)

    ref = model.apply(variables, pos, x, training=False)
    with fused_eval():
        got = model.apply(variables, pos, x, training=False)
        # the fused trace must not have added/changed any parameters
        v2 = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    assert called, "fused_eval() did not engage the Pallas SA kernel"
    assert jax.tree.structure(variables) == jax.tree.structure(v2)
    mag = max(float(jnp.max(jnp.abs(ref))), 1e-3)
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-2 * mag
    assert (jnp.argmax(got, -1) == jnp.argmax(ref, -1)).all()


def test_fused_eval_off_by_default(monkeypatch):
    """Without the context the eval path must not touch the Pallas kernel
    (bit-exact default convention)."""
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")

    called = []
    import adaptpoint_tpu.ops.pallas.saeval as saeval
    orig = saeval.sa_eval_pallas
    monkeypatch.setattr(saeval, "sa_eval_pallas",
                        lambda *a, **k: called.append(1) or orig(*a, **k))

    model = build_model_from_cfg(_tiny_cls_cfg())
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((2, 128, 3)) * 0.4, jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    model.apply(variables, pos, x, training=False)
    assert not called


@pytest.mark.slow
def test_fused_train_grad_matches_unfused(monkeypatch):
    """fused_train() (custom-VJP fused SA) input gradients match the plain
    differentiable eval path to activation grade — the GAN fake-pass
    contract."""
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("ADAPTPOINT_TPU_KERNELS", raising=False)
    from adaptpoint_tpu.utils.fastpath import fused_train
    called = []
    import adaptpoint_tpu.ops.pallas.saeval as saeval
    orig = saeval.sa_train_pallas
    monkeypatch.setattr(saeval, "sa_train_pallas",
                        lambda *a, **k: called.append(1) or orig(*a, **k))
    model = build_model_from_cfg(_tiny_cls_cfg())
    rng = np.random.default_rng(0)
    B, N = 2, 128
    pos = jnp.asarray(rng.standard_normal((B, N, 3)) * 0.4, jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), pos,
        jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1), training=False)

    def loss_plain(p):
        x = jnp.concatenate([p, jnp.abs(p[..., 1:2])], -1)
        return jnp.mean(model.apply(variables, p, x, training=False) ** 2)

    def loss_fused(p):
        with fused_train():
            return loss_plain(p)

    ref_l, ref_g = jax.value_and_grad(loss_plain)(pos)
    got_l, got_g = jax.value_and_grad(loss_fused)(pos)
    assert called, "fused_train did not route through sa_train_pallas"
    assert np.allclose(float(ref_l), float(got_l), rtol=5e-2)
    a, b = np.asarray(got_g), np.asarray(ref_g)
    scale = max(np.abs(b).max(), 1e-4)
    # bf16 activation class: the fused path runs bf16 gathers/matmuls vs
    # the f32 unfused reference, and near-tie max slots may route a
    # channel's cotangent to a different (equal-value) neighbor; element
    # max-error ~0.1-0.2 relative to the gradient scale is expected. The
    # precise per-op guard is tests/test_sa_train_fused.py (same-numerics
    # reference).
    assert np.abs(a - b).max() / scale < 0.25, np.abs(a - b).max() / scale
    # the bulk of the field must agree tightly
    assert np.median(np.abs(a - b)) / scale < 0.01


@pytest.mark.slow
def test_fused_eval_tile_unfriendly_npoint(monkeypatch):
    """npoint with no mult-of-8 divisor (S3DIS 15000/4=3750 class of
    shapes): the fused stage pads the query rows (ops.pad_query_idx) and
    slices the outputs — forward still matches unfused, same param tree."""
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("ADAPTPOINT_TPU_KERNELS", raising=False)
    called = []
    import adaptpoint_tpu.ops.pallas.saeval as saeval
    orig = saeval.sa_eval_pallas
    monkeypatch.setattr(saeval, "sa_eval_pallas",
                        lambda *a, **k: called.append(1) or orig(*a, **k))
    model = build_model_from_cfg(_tiny_cls_cfg())
    rng = np.random.default_rng(3)
    B, N = 2, 120  # -> npoints 60, 30: both % 8 != 0
    pos = jnp.asarray(rng.standard_normal((B, N, 3)) * 0.4, jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    ref = model.apply(variables, pos, x, training=False)
    with fused_eval():
        got = model.apply(variables, pos, x, training=False)
        v2 = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    assert called, "fused_eval() did not engage the Pallas SA kernel"
    assert jax.tree.structure(variables) == jax.tree.structure(v2)
    mag = max(float(jnp.max(jnp.abs(ref))), 1e-3)
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-2 * mag
    assert (jnp.argmax(got, -1) == jnp.argmax(ref, -1)).all()


def test_pad_query_idx_ball_group_parity():
    """ball_group with a padded query axis slices back to the exact
    unpadded result (the >=16M-work Pallas route pads internally; this
    pins the pad+slice algebra on the XLA composite)."""
    from adaptpoint_tpu.ops import ball_group, pad_query_idx
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 64, 6)), jnp.float32)
    qidx = jnp.asarray(rng.integers(0, 64, (2, 30)), jnp.int32)
    qpad, m = pad_query_idx(qidx)
    assert m == 30 and qpad.shape[1] % 8 == 0
    assert (qpad[:, :30] == qidx).all()
    ref = ball_group(0.8, 8, xyz, qidx, feats)
    got = ball_group(0.8, 8, xyz, qpad, feats)
    got = (got[0][:, :m], got[1][:, :m], got[2][:, :, :m], got[3][:, :m])
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        assert jnp.array_equal(r, g)


def test_ball_group_internal_pad_slice_branch(monkeypatch):
    """The REAL dispatch pad-then-slice branch (work >= PALLAS_WORK_MIN
    triggers pad_query_idx inside ball_group, outputs sliced back to
    m_orig — including the (B,K,M,3+C) dpfj axis-2 slice): force it at a
    CPU-sized problem by monkeypatching the threshold; on CPU the padded
    dispatch lowers through the XLA composite, so the slicing algebra of
    the shipped code path is compared against the unpadded result
    (ADVICE r4: the manual-padding test above never enters this branch)."""
    import adaptpoint_tpu.ops as ops
    rng = np.random.default_rng(11)
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 64, 6)), jnp.float32)
    qidx = jnp.asarray(rng.integers(0, 64, (2, 30)), jnp.int32)
    ref = ops.ball_group(0.8, 8, xyz, qidx, feats)         # small-work route
    monkeypatch.setattr(ops, "PALLAS_WORK_MIN", 1)         # force pad branch
    got = ops.ball_group(0.8, 8, xyz, qidx, feats)
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        assert jnp.array_equal(r, g)
    # ball_group_max shares the threshold + M%8 gate; qidx M=30 is not
    # tile-friendly, so with the patched threshold it must still produce
    # the exact composite result through whichever branch it picks
    ref_m = ops.ball_group_max(0.8, 8, xyz, qidx, feats)
    for r, g in zip(ref_m, ops.ball_group_max(0.8, 8, xyz, qidx, feats)):
        assert jnp.array_equal(r, g)
