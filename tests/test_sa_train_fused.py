"""Differentiable fused SA stage (ops/pallas/saeval.sa_train_pallas):
forward parity and VJP parity vs autodiff through the exact XLA composite,
in CPU interpret mode. Input gradients agree despite the tie-break
difference (pad-with-first duplicates map to the same source point, so the
scatter-add totals match jnp.max's split-ties rule)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptpoint_tpu.ops.geometry import ball_query_xla, index_points


def _ref_stage(xyz, qidx, feats, w1, b1, w2, b2, radius, K):
    new_xyz = index_points(xyz, qidx)
    fi = index_points(feats, qidx)
    idx = ball_query_xla(radius, K, xyz, new_xyz)
    dp = index_points(xyz, idx) - new_xyz[:, :, None, :]
    fj = index_points(feats, idx)
    v = jnp.concatenate([dp, fj], axis=-1)
    h = jax.nn.relu(jnp.einsum("bmkw,wh->bmkh", v, w1) + b1)
    o = jnp.einsum("bmkh,hc->bmkc", h, w2) + b2
    return new_xyz, fi, jnp.max(o, axis=2)


@pytest.fixture
def problem(rng_np):
    B, N, M, C, K = 2, 128, 32, 8, 8
    mid, cout = 16, 24
    xyz = jnp.asarray(rng_np.standard_normal((B, N, 3)) * 0.5, jnp.float32)
    qidx = jnp.asarray(np.stack(
        [np.sort(rng_np.permutation(N)[:M]) for _ in range(B)]), jnp.int32)
    feats = jnp.asarray(rng_np.standard_normal((B, N, C)), jnp.float32)
    w1 = jnp.asarray(rng_np.standard_normal((C + 3, mid)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng_np.standard_normal((mid,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng_np.standard_normal((mid, cout)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng_np.standard_normal((cout,)) * 0.1, jnp.float32)
    return (xyz, qidx, feats, w1, b1, w2, b2, 0.7, K)


def test_sa_train_forward_matches_reference(problem, monkeypatch):
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    from adaptpoint_tpu.ops.pallas.saeval import sa_train_pallas
    xyz, qidx, feats, w1, b1, w2, b2, radius, K = problem
    new_p, fi, out = sa_train_pallas(radius, K, xyz, qidx, feats,
                                     w1, b1, w2, b2)
    rp, rfi, rout = _ref_stage(xyz, qidx, feats, w1, b1, w2, b2, radius, K)
    assert np.allclose(np.asarray(new_p), np.asarray(rp), atol=1e-6)
    assert np.allclose(np.asarray(fi), np.asarray(rfi), atol=2e-2)
    assert np.allclose(np.asarray(out), np.asarray(rout),
                       atol=5e-2, rtol=5e-2)  # bf16 value gathers + matmuls


def test_sa_train_vjp_matches_reference(problem, monkeypatch):
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    from adaptpoint_tpu.ops.pallas.saeval import sa_train_pallas
    xyz, qidx, feats, w1, b1, w2, b2, radius, K = problem

    def loss_fused(xyz, feats, w1, b1, w2, b2):
        new_p, fi, out = sa_train_pallas(radius, K, xyz, qidx, feats,
                                         w1, b1, w2, b2)
        return (jnp.sum(jnp.sin(out)) + jnp.sum(fi * 0.3)
                + jnp.sum(new_p * 0.7))

    def loss_ref(xyz, feats, w1, b1, w2, b2):
        new_p, fi, out = _ref_stage(xyz, qidx, feats, w1, b1, w2, b2,
                                    radius, K)
        return (jnp.sum(jnp.sin(out)) + jnp.sum(fi * 0.3)
                + jnp.sum(new_p * 0.7))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        xyz, feats, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        xyz, feats, w1, b1, w2, b2)
    names = ("xyz", "feats", "w1", "b1", "w2", "b2")
    for n, a, b in zip(names, gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 6e-2, (
            n, np.abs(a - b).max(), scale)


def test_sa_train_param_grads_off(problem, monkeypatch):
    """param_grads=False (frozen-classifier fake pass): input gradients
    bit-match the default path; weight cotangents come back as zeros."""
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    from adaptpoint_tpu.ops.pallas.saeval import sa_train_pallas
    xyz, qidx, feats, w1, b1, w2, b2, radius, K = problem

    def loss(pg, xyz, feats, w1, b1, w2, b2):
        new_p, fi, out = sa_train_pallas(radius, K, xyz, qidx, feats,
                                         w1, b1, w2, b2, param_grads=pg)
        return (jnp.sum(jnp.sin(out)) + jnp.sum(fi * 0.3)
                + jnp.sum(new_p * 0.7))

    import functools
    g_on = jax.grad(functools.partial(loss, True),
                    argnums=(0, 1, 2, 3, 4, 5))(xyz, feats, w1, b1, w2, b2)
    g_off = jax.grad(functools.partial(loss, False),
                     argnums=(0, 1, 2, 3, 4, 5))(xyz, feats, w1, b1, w2, b2)
    # inputs: identical
    for a, b in zip(g_on[:2], g_off[:2]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # weights: statically zero
    for z in g_off[2:]:
        assert float(np.abs(np.asarray(z)).max()) == 0.0
