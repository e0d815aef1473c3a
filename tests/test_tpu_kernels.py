"""TPU kernel-golden tier: Pallas vs XLA exactness at training shapes.

Run with::

    ADAPTPOINT_TPU_TESTS=1 python -m pytest -m tpu -q

(the env var stops conftest.py pinning the CPU backend). Every exactness
claim previously living in the manually-run scripts/check_{ballgroup,knn}.py
and check_tpu.py is reproduced here so a Pallas regression fails a single
documented command (VERDICT r2 weak #3). Reference pad semantics under test:
first-K-in-radius, pad-with-first / memset-0 on empty balls
(cpp/pointnet2_batch/src/ball_query_gpu.cu:40-47).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="TPU kernel goldens need a real TPU backend "
                              "(ADAPTPOINT_TPU_TESTS=1 pytest -m tpu)"),
]

R, K = 0.15, 32


def _xla_ref(xyz, qidx, feats):
    from adaptpoint_tpu.ops import ball_query, index_points
    new_xyz = index_points(xyz, qidx)
    idx = ball_query(R, K, xyz, new_xyz)
    dp = (index_points(xyz, idx) - new_xyz[:, :, None, :]) / R
    fj = index_points(feats, idx)
    return new_xyz, jnp.concatenate([dp, fj], -1).transpose(0, 2, 1, 3), idx


def _case(rng, B, N, M, C):
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    from adaptpoint_tpu.ops.pallas.fps import furthest_point_sample_pallas
    qidx = furthest_point_sample_pallas(xyz, M)
    return xyz, feats, qidx


@pytest.mark.parametrize("shape", [(32, 2048, 1024, 64), (8, 1024, 512, 32)])
def test_ballgroup_forward_bit_exact(shape):
    """Default (3-split) fused kernel vs XLA composite: idx exact at the
    strict radius boundary, dpfj/new_xyz/fi maxerr 0."""
    from adaptpoint_tpu.ops.pallas.ballgroup import ball_group_pallas
    from adaptpoint_tpu.ops import index_points
    B, N, M, C = shape
    rng = np.random.default_rng(0)
    xyz, feats, qidx = _case(rng, B, N, M, C)
    ref_nx, ref_dpfj, ref_idx = jax.jit(_xla_ref)(xyz, qidx, feats)
    nx, fi, dpfj, idx = jax.jit(
        lambda a, b, c: ball_group_pallas(R, K, a, b, c, True, True)
    )(xyz, qidx, feats)
    assert (np.asarray(idx) == np.asarray(ref_idx)).all()
    np.testing.assert_array_equal(np.asarray(nx), np.asarray(ref_nx))
    np.testing.assert_array_equal(np.asarray(dpfj), np.asarray(ref_dpfj))
    np.testing.assert_array_equal(np.asarray(fi),
                                  np.asarray(index_points(feats, qidx)))


def test_ballgroup_backward_bit_faithful():
    """Gradient parity vs XLA autodiff in the golden 3-split scatter mode."""
    os.environ["ADAPTPOINT_TPU_BWD_SPLITS"] = "3"
    from adaptpoint_tpu.ops.pallas.ballgroup import ball_group_pallas
    from adaptpoint_tpu.ops import index_points
    rng = np.random.default_rng(1)
    xyz, feats, qidx = _case(rng, 8, 1024, 512, 32)

    def loss_xla(x, f):
        nx, dpfj, _ = _xla_ref(x, qidx, f)
        dp, fj = dpfj[..., :3], dpfj[..., 3:]
        fi = index_points(f, qidx)
        return (jnp.sum(nx ** 2) + jnp.sum(dp * dp)
                + jnp.sum(jnp.sin(fj)) + jnp.sum(fi * 0.5))

    def loss_pl(x, f):
        nx, fi, dpfj, _ = ball_group_pallas(R, K, x, qidx, f, True, True)
        dp, fj = dpfj[..., :3], dpfj[..., 3:]
        return (jnp.sum(nx ** 2) + jnp.sum(dp * dp)
                + jnp.sum(jnp.sin(fj)) + jnp.sum(fi * 0.5))

    gx1, gf1 = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(xyz, feats)
    gx2, gf2 = jax.jit(jax.grad(loss_pl, argnums=(0, 1)))(xyz, feats)
    # 3-split reconstructs the full mantissa, but the scatter-add ORDER
    # differs from XLA's (MXU accumulation vs tree reduce), so parity is
    # reordered-f32-accumulation grade — the same noise class as the CUDA
    # reference's own nondeterministic atomicAdd (group_points_gpu.cu grad
    # kernels). Measured 2e-5 relative at this shape.
    mag_x = float(np.max(np.abs(np.asarray(gx1))))
    assert np.max(np.abs(np.asarray(gx1 - gx2))) < 5e-5 * max(mag_x, 1.0)
    mag_f = float(np.max(np.abs(np.asarray(gf1))))
    assert np.max(np.abs(np.asarray(gf1 - gf2))) < 5e-5 * max(mag_f, 1.0)
    os.environ.pop("ADAPTPOINT_TPU_BWD_SPLITS", None)


def test_ballgroup_maxpool_matches_composite():
    """Fused max/min-pool variant vs the XLA composite at exact (3-split)
    gather precision; selection identical, pooled values bit-equal."""
    from adaptpoint_tpu.ops.pallas.ballgroup import ball_group_maxpool_pallas
    from adaptpoint_tpu.ops import _ball_group_max_xla
    rng = np.random.default_rng(2)
    xyz, feats, qidx = _case(rng, 8, 1024, 512, 64)
    ref = jax.jit(lambda a, b, c: _ball_group_max_xla(R, K, a, b, c))(
        xyz, qidx, feats)
    got = jax.jit(lambda a, b, c: ball_group_maxpool_pallas(
        R, K, a, b, c, 3, 3))(xyz, qidx, feats)
    for name, r, g in zip(("new_xyz", "fi", "fmax", "fmin"), ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=name)


def test_ballgroup_maxpool_bf16_selection_exact():
    """splits=1 fast mode: pooled values round to bf16 grade but the
    selected extrema come from the same neighbors (<= 1 bf16 ulp)."""
    from adaptpoint_tpu.ops.pallas.ballgroup import ball_group_maxpool_pallas
    from adaptpoint_tpu.ops import _ball_group_max_xla
    rng = np.random.default_rng(3)
    xyz, feats, qidx = _case(rng, 8, 1024, 512, 64)
    ref = jax.jit(lambda a, b, c: _ball_group_max_xla(R, K, a, b, c))(
        xyz, qidx, feats)
    got = jax.jit(lambda a, b, c: ball_group_maxpool_pallas(
        R, K, a, b, c, 1, 1))(xyz, qidx, feats)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    for r, g in zip(ref[1:], got[1:]):
        err = np.max(np.abs(np.asarray(r) - np.asarray(g)))
        assert err < 2e-2, err  # bf16 value rounding only


def test_knn_pallas_idx_exact_and_d2_differentiable():
    from adaptpoint_tpu.ops.pallas.knn import knn_pallas
    from adaptpoint_tpu.ops.geometry import knn_point as knn_xla
    rng = np.random.default_rng(4)
    xyz = jnp.asarray(rng.standard_normal((32, 1024, 3)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((32, 1024, 3)), jnp.float32)
    d2p, ip = jax.jit(lambda a, b: knn_pallas(20, a, b))(xyz, q)
    d2x, ix = jax.jit(lambda a, b: knn_xla(20, a, b))(xyz, q)
    ipn, ixn = np.asarray(ip), np.asarray(ix)
    d2xn = np.asarray(d2x)
    # the kernel's direct-form d2 and XLA's expanded form differ by ULPs,
    # which can swap the ORDER of near-tied neighbors (measured 6 of 655360
    # slots at this shape, all adjacent ties within 5e-7). The neighbor SET
    # must match everywhere; order must match wherever the distance gap
    # exceeds ULP noise.
    mism = ipn != ixn
    for b, m in {(int(r[0]), int(r[1])) for r in np.argwhere(mism)[:, :2]}:
        assert set(ipn[b, m]) == set(ixn[b, m]), (b, m)
    gap = np.abs(np.diff(d2xn, axis=-1))
    strict = np.ones_like(mism)
    strict[..., 1:] &= gap > 1e-5
    strict[..., :-1] &= gap > 1e-5
    assert not (mism & strict).any()
    # dispatcher path: d2 carries gradients on the Pallas branch too
    from adaptpoint_tpu.ops import knn_point as knn_dispatch

    def loss(a):
        d2, _ = knn_dispatch(20, a, q)
        return jnp.sum(d2)

    g = jax.jit(jax.grad(loss))(xyz)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_fps_pallas_exact():
    from adaptpoint_tpu.ops.pallas.fps import furthest_point_sample_pallas
    from adaptpoint_tpu.ops.geometry import furthest_point_sample_xla
    rng = np.random.default_rng(5)
    xyz = jnp.asarray(rng.standard_normal((16, 2048, 3)), jnp.float32)
    a = jax.jit(lambda x: furthest_point_sample_pallas(x, 512))(xyz)
    b = jax.jit(lambda x: furthest_point_sample_xla(x, 512))(xyz)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_gather_rows_exact():
    from adaptpoint_tpu.ops.pallas.gather import gather_rows_pallas
    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.standard_normal((16, 1024, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1024, (16, 512)), jnp.int32)
    a = jax.jit(gather_rows_pallas)(pts, idx)
    b = jnp.take_along_axis(pts, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flash_attention_golden():
    """mha_pallas vs the XLA one-shot reference at the mask-head training
    shape (B=32,H=4,N=2048,d=16): forward within f32-accum tolerance,
    flash-recompute gradients within bf16 activation grade."""
    from adaptpoint_tpu.ops.pallas.attention import mha_pallas
    BH, N, D = 16, 2048, 16
    scale = D ** 0.5
    rng = np.random.default_rng(0)
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

    got = jax.jit(lambda *a: mha_pallas(*a, scale))(q, k, v)
    want = jax.jit(ref)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)

    gp = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(mha_pallas(*a, scale))),
                          argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                          argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gp, gr):
        scale_b = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-2 * max(scale_b, 1.0))


@pytest.mark.parametrize("B,N", [(8, 2048), (4, 4096)])
def test_fused_eval_sa_golden(B, N):
    """Fused eval SA kernel vs the plain eval path on PointNeXt-S at the
    feedback shape (B=8, N=2048) and at the gate's upper support bound
    (N=4096 — ADVICE r4: supports in 2049-4096 rode the kernel with no
    golden): bf16-grade logits, argmax parity."""
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.utils.fastpath import fused_eval

    cfg = EasyConfig()
    cfg.load("cfgs/scanobjectnn/pointnext-s.yaml", recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)) * 0.4, jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)

    ref = jax.jit(lambda p, f: model.apply(variables, p, f,
                                           training=False))(pos, x)

    @jax.jit
    def fused(p, f):
        with fused_eval():
            return model.apply(variables, p, f, training=False)

    got = fused(pos, x)
    mag = max(float(jnp.max(jnp.abs(ref))), 1e-3)
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-2 * mag
    match = float(jnp.mean((jnp.argmax(got, -1) == jnp.argmax(ref, -1))
                           .astype(jnp.float32)))
    assert match == 1.0


@pytest.mark.tpu
def test_fused_train_sa_grad_golden():
    """Custom-VJP fused SA (fastpath.fused_train) vs the plain
    differentiable eval path on PointNeXt-S at the GAN fake-pass shape:
    input gradients agree to activation grade."""
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.utils.fastpath import fused_train

    cfg = EasyConfig()
    cfg.load("cfgs/scanobjectnn/pointnext-s.yaml", recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    rng = np.random.default_rng(0)
    B, N = 8, 2048
    pos = jnp.asarray(rng.standard_normal((B, N, 3)) * 0.4, jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), pos,
        jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], -1), training=False)

    def loss_plain(p):
        f = jnp.concatenate([p, jnp.abs(p[..., 1:2])], -1)
        return jnp.mean(model.apply(variables, p, f, training=False) ** 2)

    @jax.jit
    def grad_plain(p):
        return jax.value_and_grad(loss_plain)(p)

    @jax.jit
    def grad_fused(p):
        def loss(p):
            with fused_train():
                return loss_plain(p)
        return jax.value_and_grad(loss)(p)

    ref_l, ref_g = grad_plain(pos)
    got_l, got_g = grad_fused(pos)
    assert np.allclose(float(ref_l), float(got_l), rtol=5e-2)
    a, b = np.asarray(got_g), np.asarray(ref_g)
    scale = max(np.abs(b).max(), 1e-4)
    assert np.abs(a - b).max() / scale < 0.25, np.abs(a - b).max() / scale
    assert np.median(np.abs(a - b)) / scale < 0.01


@pytest.mark.tpu
def test_fused_trainbn_sa_golden(monkeypatch):
    """Fused train-BN SA family (ops/pallas/satrainbn.py, gated by
    fastpath.fused_train_bn) vs the plain unfused TRAIN step on
    PointNeXt-S at the phase-B shape (B=32, N=1024): logits, batch-stats
    updates and parameter gradients.

    Tolerances are SELF-CALIBRATING against the platform's own numerics
    grade: on TPU, XLA's DEFAULT f32 matmul precision is bf16-multiply/
    f32-accumulate, and two stacked batch-stat BN chains amplify that to
    ~7% logits spread vs true f32 — measured here by also running the
    unfused path at matmul precision 'highest' (with XLA grouping; the
    Pallas grouping kernels are bf16-by-construction and reject fp32
    contract precision). The fused path must sit within a small multiple
    of the |default - highest| spread per tensor — i.e. be the SAME grade
    as what the unfused phase-B of the committed evidence runs already
    uses — while the exact *math* parity is proven at f32 grade by the
    CPU interpreter tier (tests/test_trainbn_kernel.py)."""
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.utils.fastpath import fused_train_bn

    cfg = EasyConfig()
    cfg.load("cfgs/scanobjectnn/pointnext-s.yaml", recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    rng = np.random.default_rng(0)
    B, N = 32, 1024
    pos = jnp.asarray(rng.standard_normal((B, N, 3)) * 0.4, jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    y = jnp.asarray(rng.integers(0, 15, B))
    drng = {"dropout": jax.random.PRNGKey(1)}

    def run_variant(fused, prec, kernels):
        monkeypatch.setenv("ADAPTPOINT_TPU_KERNELS", kernels)

        def loss_fn(params):
            def run():
                with jax.default_matmul_precision(prec):
                    logits, upd = model.apply(
                        {"params": params,
                         "batch_stats": variables["batch_stats"]},
                        pos, x, training=True, rngs=drng,
                        mutable=["batch_stats"])
                l = -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(B), y])
                return l, (logits, upd["batch_stats"])
            if fused:
                with fused_train_bn():
                    return run()
            return run()

        @jax.jit
        def go(params):
            (l, (logits, bs)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return l, logits, bs, g

        out = go(variables["params"])
        monkeypatch.delenv("ADAPTPOINT_TPU_KERNELS", raising=False)
        return jax.tree.map(np.asarray, out)

    l_ref, log_ref, bs_ref, g_ref = run_variant(False, "default", "auto")
    l_hi, log_hi, bs_hi, g_hi = run_variant(False, "highest", "xla")
    l_got, log_got, bs_got, g_got = run_variant(True, "default", "auto")

    # the platform's own bf16-matmul-grade spread is the yardstick
    assert abs(l_got - l_ref) <= 4 * max(abs(l_ref - l_hi), 1e-4)
    mag = max(float(np.abs(log_ref).max()), 1e-3)
    floor = max(float(np.abs(log_ref - log_hi).max()), 1e-3 * mag)
    assert float(np.abs(log_got - log_ref).max()) <= 4 * floor

    for tree_ref, tree_hi, tree_got, label, cmin in (
            (bs_ref, bs_hi, bs_got, "batch_stats", 1e-5),
            (g_ref, g_hi, g_got, "grad", 1e-4)):
        gscale = max(float(np.abs(l).max())
                     for l in jax.tree_util.tree_leaves(tree_ref))
        for (pth, r), (_, h), (_, g) in zip(
                jax.tree_util.tree_leaves_with_path(tree_ref),
                jax.tree_util.tree_leaves_with_path(tree_hi),
                jax.tree_util.tree_leaves_with_path(tree_got)):
            fl = max(float(np.abs(r - h).max()), cmin * gscale)
            d = float(np.abs(g - r).max())
            assert d <= 6 * fl, (
                f"{label}{jax.tree_util.keystr(pth)}: fused diff {d:.3e} "
                f"exceeds 6x the default-vs-highest spread {fl:.3e}")


def test_fpinterp_weighted_gather_golden():
    """Fused 3-NN weighted interpolation (ops/pallas/fpinterp.py) at the
    largest augmentor FP-decode shape: fwd within the 2-way-bf16-split
    truncation of the composite, VJP at activation grade."""
    from adaptpoint_tpu.ops.pallas.fpinterp import (weighted_gather3,
                                                    weighted_gather3_fits)
    from adaptpoint_tpu.ops.geometry import index_points
    rng = np.random.default_rng(11)
    B, M, C, N = 32, 1024, 128, 2048
    assert weighted_gather3_fits(N, M, C)
    feat = jnp.asarray(rng.standard_normal((B, M, C)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, M, size=(B, N, 3)), jnp.int32)
    w = rng.random((B, N, 3)).astype(np.float32) + 1e-3
    w = jnp.asarray(w / w.sum(-1, keepdims=True))

    def composite(feat, w):
        return jnp.sum(index_points(feat, idx) * w[..., None], axis=2)

    def loss_fused(feat, w):
        return jnp.sum(jnp.sin(weighted_gather3(feat, idx, w)))

    def loss_ref(feat, w):
        return jnp.sum(jnp.sin(composite(feat, w)))

    out = jax.jit(weighted_gather3)(feat, idx, w)
    ref = jax.jit(composite)(feat, w)
    assert float(jnp.abs(out - ref).max()) < 5e-5

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(feat, w)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(feat, w)
    for name, a, b in zip(("dfeat", "dw"), gf, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 2e-2, (
            name, np.abs(a - b).max(), scale)
