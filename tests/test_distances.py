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


def test_emd_reference_ground_truth():
    """Port of the reference's hand-computed EMD test
    (cpp/emd/test_emd_loss.py:1-50): two 2-point clouds whose optimal
    matching is the cross pairing; cost is the summed SQUARED distance,
    scaled per-batch 1/2, 2, 1/3."""
    import jax
    import jax.numpy as jnp
    from adaptpoint_tpu.ops.distances import earth_mover_distance

    p1 = jnp.asarray(np.tile(np.array(
        [[[1.7, -0.1, 0.1], [0.1, 1.2, 0.3]]], np.float32), (3, 1, 1)))
    p2 = jnp.asarray(np.tile(np.array(
        [[[0.3, 1.8, 0.2], [1.2, -0.2, 0.3]]], np.float32), (3, 1, 1)))
    d = np.asarray(earth_mover_distance(p1, p2))
    gt = (((np.array([1.7, -0.1, 0.1]) - np.array([1.2, -0.2, 0.3])) ** 2).sum()
          + ((np.array([0.1, 1.2, 0.3]) - np.array([0.3, 1.8, 0.2])) ** 2).sum())
    np.testing.assert_allclose(d, gt, rtol=1e-4)
    loss_fn = lambda a: (earth_mover_distance(a, p2)[0] / 2
                         + earth_mover_distance(a, p2)[1] * 2
                         + earth_mover_distance(a, p2)[2] / 3)
    np.testing.assert_allclose(float(loss_fn(p1)),
                               gt / 2 + gt * 2 + gt / 3, rtol=1e-4)
    # backward treats the match as constant (matchcost_backward semantics):
    # d(cost)/d(p1[k]) = 2 * sum_l match[l,k] (p1[k] - p2[l]); optimal plan
    # here is one-to-one cross pairing, scaled by the per-batch factor
    g = np.asarray(jax.grad(loss_fn)(p1))
    expect_b0 = np.stack([np.array([1.7, -0.1, 0.1]) - np.array([1.2, -0.2, 0.3]),
                          np.array([0.1, 1.2, 0.3]) - np.array([0.3, 1.8, 0.2])])
    np.testing.assert_allclose(g[0], 2 * expect_b0 / 2, atol=1e-4)
    np.testing.assert_allclose(g[1], 2 * expect_b0 * 2, atol=1e-4)
    np.testing.assert_allclose(g[2], 2 * expect_b0 / 3, atol=1e-4)


def test_emd_loss_wrapper_scaling():
    from adaptpoint_tpu.ops.distances import emd_loss, earth_mover_distance
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    np.testing.assert_allclose(
        float(emd_loss(a, b)),
        float(np.mean(np.asarray(earth_mover_distance(a, b)) / 32)),
        rtol=1e-6)
