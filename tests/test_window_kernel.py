"""Windowed ball-group maxpool (ops/pallas/window.py) — CPU interpreter tier.

Forward parity is exact vs the XLA composite (same first-K-in-index-order
selection through the window machinery); backward parity is exact vs a
take_along_axis oracle that reproduces the kernel's documented argmax-first
gradient routing (ops/pallas/ballgroup.py maxpool section).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaptpoint_tpu.ops import _ball_group_max_xla, ball_query_xla, index_points


def _case(rng, b, n, m, c):
    xyz = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    qidx = jnp.stack([jnp.asarray(rng.choice(n, m, replace=False))
                      for _ in range(b)]).astype(jnp.int32)
    return xyz, feats, qidx


@pytest.mark.slow  # prototype kernel, not on any default dispatch path
@pytest.mark.parametrize("radius,tm,wov", [(0.3, 128, None),
                                           (0.05, 64, "384"),
                                           (1.5, 128, None)])
def test_windowed_maxpool_fwd_matches_composite(monkeypatch, radius, tm, wov):
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    if wov:  # gaussian test clouds span ~6 units, wider than the extent=2
        monkeypatch.setenv("ADAPTPOINT_TPU_WINDOW", wov)  # model: widen
    from adaptpoint_tpu.ops.pallas.window import (
        ball_group_maxpool_windowed, window_prep, pick_window)
    rng = np.random.default_rng(0)
    B, N, M, C, K = 2, 512, 256, 16, 8
    xyz, feats, qidx = _case(rng, B, N, M, C)
    w = pick_window(512, radius, M, tm)
    ok = bool(window_prep(xyz, qidx, radius, tm, w)["ok"])
    assert ok, "test case must fit the window"
    ref = _ball_group_max_xla(radius, K, xyz, qidx, feats)
    got = ball_group_maxpool_windowed(radius, K, xyz, qidx, feats, 3, 3, tm)
    for name, r, g in zip(("new_xyz", "fi", "fmax", "fmin"), ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=name)


@pytest.mark.slow  # prototype kernel, not on any default dispatch path
def test_windowed_maxpool_grad_matches_oracle(monkeypatch):
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    from adaptpoint_tpu.ops.pallas.window import ball_group_maxpool_windowed
    rng = np.random.default_rng(1)
    B, N, M, C, K, R, TM = 2, 512, 256, 16, 8, 0.3, 128
    xyz, feats, qidx = _case(rng, B, N, M, C)

    def loss_oracle(x, f):
        nx = index_points(x, qidx)
        fi = index_points(f, qidx)
        idx = ball_query_xla(R, K, x, nx)
        fj = index_points(f, idx)  # (B, M, K, C)
        # argmax-first routing (kernel semantics): gather the winning slot
        amax = jnp.argmax(fj, axis=2, keepdims=True)
        amin = jnp.argmin(fj, axis=2, keepdims=True)
        fmax = jnp.take_along_axis(fj, amax, axis=2)[:, :, 0]
        fmin = jnp.take_along_axis(fj, amin, axis=2)[:, :, 0]
        return (jnp.sum(nx ** 2) + jnp.sum(fi * 0.5)
                + jnp.sum(jnp.sin(fmax)) + jnp.sum(jnp.cos(fmin)))

    def loss_win(x, f):
        nx, fi, fmax, fmin = ball_group_maxpool_windowed(
            R, K, x, qidx, f, 3, 3, TM)
        return (jnp.sum(nx ** 2) + jnp.sum(fi * 0.5)
                + jnp.sum(jnp.sin(fmax)) + jnp.sum(jnp.cos(fmin)))

    gf1 = jax.grad(loss_oracle, argnums=1)(xyz, feats)
    gf2 = jax.grad(loss_win, argnums=1)(xyz, feats)
    mag = float(np.max(np.abs(np.asarray(gf1))))
    assert np.max(np.abs(np.asarray(gf1 - gf2))) < 5e-6 * max(mag, 1.0)


def test_window_prep_overflow_detection(monkeypatch):
    """A cloud clustered onto one key value forces windows wider than w:
    ok must be False (callers then take the full-N kernel)."""
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    from adaptpoint_tpu.ops.pallas.window import window_prep
    rng = np.random.default_rng(2)
    B, N, M = 1, 512, 256
    xyz = np.zeros((B, N, 3), np.float32)
    xyz[..., 1] = rng.standard_normal((B, N)) * 1e-6  # degenerate key axis
    xyz = jnp.asarray(xyz)
    qidx = jnp.asarray(rng.choice(N, M, replace=False))[None].astype(jnp.int32)
    prep = window_prep(xyz, qidx, 0.3, 128, 256)
    assert not bool(prep["ok"])
