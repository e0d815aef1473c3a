"""Fused 3-NN weighted interpolation gather (ops/pallas/fpinterp.py):
forward and VJP parity vs the composite gather+weight+sum, in CPU
interpret mode. The kernel is the bf16 fast path of ops.three_interpolation
(reference three_interpolate, cpp/pointnet2_batch/src/interpolate_gpu.cu);
f32 features keep the bit-exact composite."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _composite(feat, idx, w):
    from adaptpoint_tpu.ops.geometry import index_points
    gathered = index_points(feat, idx)  # (B,N,3,C)
    return jnp.sum(gathered * w[..., None], axis=2)


@pytest.fixture
def problem(rng_np):
    B, M, C, N = 2, 128, 128, 192
    feat = jnp.asarray(rng_np.standard_normal((B, M, C)), jnp.bfloat16)
    idx = jnp.asarray(rng_np.integers(0, M, size=(B, N, 3)), jnp.int32)
    # duplicate-neighbor rows (3-NN ties): the weighted one-hot must sum
    idx = idx.at[:, 0, 1].set(idx[:, 0, 0])
    w = rng_np.random((B, N, 3)).astype(np.float32) + 1e-3
    w = jnp.asarray(w / w.sum(-1, keepdims=True))
    return feat, idx, w


def test_forward_matches_composite(problem, monkeypatch):
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    from adaptpoint_tpu.ops.pallas.fpinterp import weighted_gather3
    feat, idx, w = problem
    out = weighted_gather3(feat, idx, w)
    ref = _composite(feat, idx, w)
    assert out.dtype == ref.dtype == jnp.float32
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    # only the 2-way bf16 weight split truncates (~2^-17 relative)
    assert err < 5e-5, err


def test_vjp_matches_composite(problem, monkeypatch):
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    from adaptpoint_tpu.ops.pallas.fpinterp import weighted_gather3
    feat, idx, w = problem

    def loss_fused(feat, w):
        return jnp.sum(jnp.sin(weighted_gather3(feat, idx, w)))

    def loss_ref(feat, w):
        return jnp.sum(jnp.sin(_composite(feat, idx, w)))

    gf_feat, gf_w = jax.grad(loss_fused, argnums=(0, 1))(feat, w)
    gr_feat, gr_w = jax.grad(loss_ref, argnums=(0, 1))(feat, w)
    assert gf_feat.dtype == feat.dtype and gf_w.dtype == w.dtype
    for name, a, b in (("dfeat", gf_feat, gr_feat), ("dw", gf_w, gr_w)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        # backward cotangents ride bf16 matmuls (activation-grade)
        assert np.abs(a - b).max() / scale < 2e-2, (name,
                                                    np.abs(a - b).max())


def test_three_interpolation_kernel_route(rng_np, monkeypatch):
    """ops.three_interpolation with bf16 features routes to the fused
    kernel under KERNELS=pallas (interpret) and matches the composite."""
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    from adaptpoint_tpu import ops
    B, M, N, C = 2, 128, 256, 128
    p1 = jnp.asarray(rng_np.standard_normal((B, N, 3)), jnp.float32)
    p2 = jnp.asarray(rng_np.standard_normal((B, M, 3)), jnp.float32)
    f2 = jnp.asarray(rng_np.standard_normal((B, M, C)), jnp.bfloat16)

    monkeypatch.setenv("ADAPTPOINT_TPU_FPINTERP", "0")
    ref = ops.three_interpolation(p1, p2, f2)
    monkeypatch.delenv("ADAPTPOINT_TPU_FPINTERP")
    monkeypatch.setenv("ADAPTPOINT_TPU_KERNELS", "pallas")
    out = ops.three_interpolation(p1, p2, f2)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 5e-5, err


def test_f32_features_never_enter_kernel(rng_np, monkeypatch):
    """f32 features must stay on the bit-exact composite (seg-decoder
    parity requirement): the fused kernel must not even be considered."""
    from adaptpoint_tpu import ops
    from adaptpoint_tpu.ops.pallas import fpinterp

    def _boom(*a, **k):
        raise AssertionError("fused kernel reached with f32 features")

    monkeypatch.setattr(fpinterp, "weighted_gather3", _boom)
    monkeypatch.setattr(fpinterp, "weighted_gather3_fits", _boom)
    B, M, N, C = 2, 128, 256, 128
    p1 = jnp.asarray(rng_np.standard_normal((B, N, 3)), jnp.float32)
    p2 = jnp.asarray(rng_np.standard_normal((B, M, 3)), jnp.float32)
    f2 = jnp.asarray(rng_np.standard_normal((B, M, C)), jnp.float32)
    out = ops.three_interpolation(p1, p2, f2)
    monkeypatch.setenv("ADAPTPOINT_TPU_FPINTERP", "0")
    ref = ops.three_interpolation(p1, p2, f2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
