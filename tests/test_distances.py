"""Chamfer + approximate EMD tests (parity with the reference test
vectors: cpp/chamfer_dist/test.py gradcheck shapes; cpp/emd/test_emd_loss.py
hand-computed ground truth)."""
import numpy as np
import jax
import jax.numpy as jnp

from adaptpoint_tpu.ops.distances import chamfer_distance, emd_sinkhorn


def test_chamfer_identical_clouds(rng_np):
    x = jnp.asarray(rng_np.standard_normal((4, 64, 3)), jnp.float32)
    d1, d2 = chamfer_distance(x, x)
    assert np.allclose(np.asarray(d1), 0, atol=1e-5)
    assert np.allclose(np.asarray(d2), 0, atol=1e-5)


def test_chamfer_known_value():
    a = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]])
    b = jnp.asarray([[[0.0, 0, 0], [2, 0, 0]]])
    d1, d2 = chamfer_distance(a, b)
    assert np.allclose(np.asarray(d1), [[0.0, 1.0]])
    assert np.allclose(np.asarray(d2), [[0.0, 1.0]])


def test_chamfer_grad(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 32, 3)), jnp.float32)
    y = jnp.asarray(rng_np.standard_normal((2, 48, 3)), jnp.float32)

    def loss(a):
        d1, d2 = chamfer_distance(a, y)
        return jnp.mean(d1) + jnp.mean(d2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape and bool(jnp.any(g != 0))


def test_emd_identical_is_small(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 32, 3)), jnp.float32)
    d = emd_sinkhorn(x, x, eps=0.005, iters=100)
    assert (np.asarray(d) < 0.05).all()


def test_emd_translation():
    # reference-style check (cpp/emd/test_emd_loss.py): translating a cloud by
    # t makes EMD ~ |t| under uniform matching
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 3)), jnp.float32)
    y = x + jnp.asarray([1.0, 0, 0])
    d = float(emd_sinkhorn(x, y, eps=0.01, iters=200)[0])
    assert abs(d - 1.0) < 0.1
