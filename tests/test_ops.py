"""Golden-value tests for geometry ops vs brute-force numpy references that
replicate the reference CUDA kernel semantics exactly (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptpoint_tpu.ops import (
    square_distance, furthest_point_sample, ball_query, knn_point,
    three_nn, three_interpolation, index_points,
)
from adaptpoint_tpu.ops.geometry import furthest_point_sample_xla


def np_fps(xyz, npoint):
    """Brute-force replica of sampling_gpu.cu:101-216."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        temp = np.full(N, 1e10, np.float32)
        old = 0
        for j in range(1, npoint):
            d = ((xyz[b] - xyz[b, old]) ** 2).sum(-1).astype(np.float32)
            temp = np.minimum(temp, d)
            old = int(np.argmax(temp))
            out[b, j] = old
    return out


def np_ball_query(radius, nsample, xyz, new_xyz):
    """Brute-force replica of ball_query_gpu.cu:16-51 (pad-with-first rule)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, nsample), np.int32)
    r2 = radius * radius
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d2 = ((new_xyz[b, m] - xyz[b, k]) ** 2).sum()
                if d2 < r2:
                    if cnt == 0:
                        idx[b, m, :] = k
                    idx[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


@pytest.fixture
def cloud(rng_np):
    return rng_np.standard_normal((4, 128, 3)).astype(np.float32)


def test_square_distance(cloud):
    d = np.asarray(square_distance(jnp.array(cloud), jnp.array(cloud)))
    ref = ((cloud[:, :, None] - cloud[:, None]) ** 2).sum(-1)
    assert np.allclose(d, ref, atol=1e-3)


def test_fps_matches_reference_semantics(cloud):
    got = np.asarray(furthest_point_sample(jnp.array(cloud), 16))
    ref = np_fps(cloud, 16)
    assert (got == ref).all()


def test_fps_first_index_zero(cloud):
    got = np.asarray(furthest_point_sample(jnp.array(cloud), 4))
    assert (got[:, 0] == 0).all()


def test_ball_query_semantics(cloud):
    new_xyz = cloud[:, :32]
    got = np.asarray(ball_query(0.8, 8, jnp.array(cloud), jnp.array(new_xyz)))
    ref = np_ball_query(0.8, 8, cloud, new_xyz)
    assert (got == ref).all()


def test_ball_query_empty_ball(rng_np):
    # all support points far away -> idx all zeros (reference memset behavior)
    xyz = rng_np.standard_normal((2, 64, 3)).astype(np.float32) + 100.0
    new_xyz = np.zeros((2, 4, 3), np.float32)
    got = np.asarray(ball_query(0.5, 8, jnp.array(xyz), jnp.array(new_xyz)))
    assert (got == 0).all()


def test_knn_point(cloud):
    d2, idx = knn_point(5, jnp.array(cloud), jnp.array(cloud[:, :16]))
    ref = ((cloud[:, :16, None] - cloud[:, None]) ** 2).sum(-1)
    ref_idx = np.argsort(ref, axis=-1)[..., :5]
    # compare as sets per query (ties may reorder)
    assert (np.sort(np.asarray(idx), -1) == np.sort(ref_idx, -1)).all()
    assert np.allclose(np.sort(np.asarray(d2), -1), np.sort(ref, -1)[..., :5], atol=1e-3)


def test_three_nn_and_interpolation(cloud):
    known = cloud[:, :32]
    feat = np.tile(known[..., :1], (1, 1, 8)).astype(np.float32)  # C=8 from x-coord
    dist, idx = three_nn(jnp.array(cloud), jnp.array(known))
    assert dist.shape == (4, 128, 3) and idx.shape == (4, 128, 3)
    assert np.all(np.asarray(dist) >= 0)
    out = three_interpolation(jnp.array(cloud), jnp.array(known), jnp.array(feat))
    assert out.shape == (4, 128, 8)
    # interpolation of a constant field is constant
    const = np.ones_like(feat)
    out_c = three_interpolation(jnp.array(cloud), jnp.array(known), jnp.array(const))
    assert np.allclose(np.asarray(out_c), 1.0, atol=1e-5)


def test_three_interpolation_differentiable(cloud):
    known = jnp.array(cloud[:, :32])
    feat = jnp.array(cloud[:, :32])

    def loss(f):
        return jnp.sum(three_interpolation(jnp.array(cloud), known, f) ** 2)

    g = jax.grad(loss)(feat)
    assert g.shape == feat.shape
    assert bool(jnp.any(g != 0))


def test_index_points(cloud):
    idx = np.array([[0, 5, 7], [1, 2, 3], [4, 4, 4], [0, 0, 1]], np.int32)
    out = np.asarray(index_points(jnp.array(cloud), jnp.array(idx)))
    for b in range(4):
        assert np.allclose(out[b], cloud[b, idx[b]])
    # nested idx (B, M, K)
    idx2 = np.stack([idx, idx], axis=2)  # (4,3,2)
    out2 = np.asarray(index_points(jnp.array(cloud), jnp.array(idx2)))
    assert out2.shape == (4, 3, 2, 3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas interpret mode deadlocks on CPU in this jax "
                           "build; kernel is golden-tested on TPU (scripts/check_tpu.py)")
def test_fps_pallas_matches_xla_on_tpu(cloud):
    from adaptpoint_tpu.ops.pallas.fps import furthest_point_sample_pallas

    got = np.asarray(furthest_point_sample_pallas(jnp.array(cloud), 16))
    ref = np.asarray(furthest_point_sample_xla(jnp.array(cloud), 16))
    assert (got == ref).all()


def test_ball_group_composite_semantics(cloud):
    """ball_group (XLA fallback on CPU) == its individual-op composition."""
    from adaptpoint_tpu.ops import ball_group
    feats = jnp.array(cloud[:, :, :1].repeat(8, axis=2))
    qidx = furthest_point_sample(jnp.array(cloud), 16)
    new_xyz, fi, dpfj, idx = ball_group(0.8, 8, jnp.array(cloud), qidx, feats,
                                        relative=True, normalize_dp=True)
    assert new_xyz.shape == (4, 16, 3)
    assert fi.shape == (4, 16, 8)
    assert dpfj.shape == (4, 8, 16, 11)  # (B, K, M, 3+C)
    assert idx.shape == (4, 16, 8)
    # cross-check against the separate ops
    ref_new = index_points(jnp.array(cloud), qidx)
    ref_idx = ball_query(0.8, 8, jnp.array(cloud), ref_new)
    assert (np.asarray(idx) == np.asarray(ref_idx)).all()
    ref_dp = (index_points(jnp.array(cloud), ref_idx)
              - ref_new[:, :, None, :]) / 0.8
    assert np.allclose(np.asarray(dpfj[..., :3]),
                       np.asarray(ref_dp).transpose(0, 2, 1, 3), atol=1e-6)
    ref_fj = index_points(feats, ref_idx)
    assert np.allclose(np.asarray(dpfj[..., 3:]),
                       np.asarray(ref_fj).transpose(0, 2, 1, 3), atol=1e-6)


def test_gather_rows_fallback(cloud):
    from adaptpoint_tpu.ops import gather_rows
    idx = jnp.array([[0, 5, 7], [1, 2, 3], [4, 4, 4], [0, 0, 1]], jnp.int32)
    out = gather_rows(jnp.array(cloud), idx)
    ref = index_points(jnp.array(cloud), idx)
    assert np.allclose(np.asarray(out), np.asarray(ref))


def test_kmeans_separated_clusters():
    from adaptpoint_tpu.models.layers.kmeans import kmeans
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 32, 3)) * 0.1
    b = rng.standard_normal((1, 32, 3)) * 0.1 + 10.0
    pts = jnp.asarray(np.concatenate([a, b], axis=1), jnp.float32)
    assign, cents = kmeans(pts, 2, n_iters=5)
    assign = np.asarray(assign)[0]
    # the two blobs end up in different clusters
    assert len(set(assign[:32])) == 1 and len(set(assign[32:])) == 1
    assert assign[0] != assign[32]


def test_ball_group_max_bf16_dispatch_traces():
    """bf16 feats above the Pallas-dispatch threshold must trace: both
    lax.platform_dependent branches need identical output dtypes (the gan
    bf16 compute policy feeds bf16 feats into the controller's grouper;
    regression for a trace-time TypeError on the TPU path)."""
    from adaptpoint_tpu.ops import ball_group_max, furthest_point_sample
    rng = np.random.default_rng(3)
    # B*M*K*N = 1*512*32*1024 = 16.8M >= 16M threshold, M % 8 == 0
    cloud = jnp.array(rng.standard_normal((1, 1024, 3)), jnp.float32)
    feats = jnp.array(rng.standard_normal((1, 1024, 8)), jnp.bfloat16)
    qidx = furthest_point_sample(cloud, 512)
    new_xyz, fi, fmax, fmin = jax.jit(
        lambda c, q, f: ball_group_max(0.4, 32, c, q, f))(cloud, qidx, feats)
    assert fi.dtype == jnp.bfloat16
    assert fmax.dtype == jnp.bfloat16 and fmin.dtype == jnp.bfloat16
    # values match the f32 composite to bf16 grade
    _, fi32, fmax32, fmin32 = ball_group_max(
        0.4, 32, cloud, qidx, feats.astype(jnp.float32))
    assert np.allclose(np.asarray(fmax, np.float32),
                       np.asarray(fmax32), atol=2e-2)
    assert np.allclose(np.asarray(fmin, np.float32),
                       np.asarray(fmin32), atol=2e-2)


def test_flash_attention_interpret_matches_xla(monkeypatch):
    """mha_pallas (CPU interpreter) == the XLA one-shot softmax path; the
    flash-recompute VJP agrees to bf16 activation grade. Guards the mask
    head's fused-attention branch without TPU hardware."""
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    from adaptpoint_tpu.ops.pallas.attention import mha_pallas
    BH, N, D = 2, 256, 16
    scale = D ** 0.5
    rng = np.random.default_rng(1)
    q = jnp.array(rng.standard_normal((BH, N, D)), jnp.float32)
    k = jnp.array(rng.standard_normal((BH, N, D)), jnp.float32)
    v = jnp.array(rng.standard_normal((BH, N, D)), jnp.float32)

    def ref(q, k, v):
        s = jnp.einsum("bmd,bnd->bmn", q.astype(jnp.bfloat16),
                       k.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) / scale
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bmn,bnd->bmd", a.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    got = mha_pallas(q, k, v, scale)
    want = ref(q, k, v)
    assert float(jnp.max(jnp.abs(got - want))) < 2e-3

    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(mha_pallas(*a, scale))),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        mag = max(float(jnp.max(jnp.abs(b))), 1.0)
        assert float(jnp.max(jnp.abs(a - b))) < 3e-2 * mag


def test_flash_attention_bf16_inputs(monkeypatch):
    """bf16 q/k/v (the controller's compute dtype, passed without the
    HBM upcast copies): forward is IDENTICAL to upcast-f32 inputs (the
    kernel casts to bf16 for its matmuls either way); cotangents come
    back bf16 and match the f32 run at storage-rounding grade."""
    monkeypatch.setenv("ADAPTPOINT_TPU_PALLAS_INTERPRET", "1")
    from adaptpoint_tpu.ops.pallas.attention import mha_pallas
    BH, N, D = 2, 256, 16
    scale = D ** 0.5
    rng = np.random.default_rng(3)
    qb = jnp.array(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    kb = jnp.array(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    vb = jnp.array(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    q, k, v = (x.astype(jnp.float32) for x in (qb, kb, vb))

    got = mha_pallas(qb, kb, vb, scale)
    want = mha_pallas(q, k, v, scale)
    assert got.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    gb = jax.grad(lambda *a: jnp.sum(jnp.sin(mha_pallas(*a, scale))),
                  argnums=(0, 1, 2))(qb, kb, vb)
    gf = jax.grad(lambda *a: jnp.sum(jnp.sin(mha_pallas(*a, scale))),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gb, gf):
        assert a.dtype == jnp.bfloat16
        mag = max(float(jnp.max(jnp.abs(b))), 1.0)
        assert float(jnp.max(jnp.abs(a.astype(jnp.float32) - b))) \
            < 1e-2 * mag


def test_nested_fps_prefix_identity(rng_np):
    """FPS is greedy => prefix-nested: (1) fps(x, m) == fps(x, n)[:m];
    (2) fps over a selection-ordered FPS subset is arange — the identity
    every encoder stage after the first subsample relies on
    (ops.fps_prefix_idx)."""
    from adaptpoint_tpu.ops import fps_prefix_idx, index_points

    x = jnp.asarray(rng_np.standard_normal((4, 256, 3)), jnp.float32)
    idx64 = furthest_point_sample(x, 64)
    idx16 = furthest_point_sample(x, 16)
    assert (np.asarray(idx64[:, :16]) == np.asarray(idx16)).all()

    sub = index_points(x, idx64)  # (4, 64, 3) in FPS selection order
    again = furthest_point_sample(sub, 32)
    assert (np.asarray(again)
            == np.asarray(fps_prefix_idx(4, 32))).all()


def test_nested_fps_encoder_equivalence(rng_np):
    """PointNextEncoder output is identical with the nested-FPS shortcut on
    vs off (generic point positions: no distance ties)."""
    import os
    from adaptpoint_tpu.models.backbone.pointnext import PointNextEncoder

    enc = PointNextEncoder(in_channels=3, width=8, blocks=(1, 1, 1),
                           strides=(1, 4, 4), sa_layers=1, expansion=4)
    x = jnp.asarray(rng_np.standard_normal((2, 128, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x, x, False)

    old = os.environ.get("ADAPTPOINT_TPU_NESTED_FPS")
    try:
        os.environ["ADAPTPOINT_TPU_NESTED_FPS"] = "0"
        ps_off, fs_off = enc.apply(params, x, x, False)
        os.environ["ADAPTPOINT_TPU_NESTED_FPS"] = "1"
        ps_on, fs_on = enc.apply(params, x, x, False)
    finally:
        if old is None:
            os.environ.pop("ADAPTPOINT_TPU_NESTED_FPS", None)
        else:
            os.environ["ADAPTPOINT_TPU_NESTED_FPS"] = old
    for a, b in zip(ps_off, ps_on):
        assert np.allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(fs_off, fs_on):
        assert np.allclose(np.asarray(a), np.asarray(b))
