"""Forward-shape + one-train-step tests for the round-2 model wrappers:
PointNet2PartDecoder, PointMLP, PointViTDecoder/PointViTPartDecoder,
DistillCls, FoldingNet (VERDICT.md round-1 items 5-7)."""
import jax
import jax.numpy as jnp
import optax
import pytest

from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.models.build import MODELS


@pytest.fixture
def inputs(rng_np):
    pos = jnp.asarray(rng_np.standard_normal((2, 128, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    return pos, x


def _one_sgd_step(model, variables, loss_fn):
    params = variables["params"]
    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    new_params = jax.tree.map(lambda p, g: p - 1e-3 * g, params, grads)
    moved = any(bool(jnp.any(p != q)) for p, q in
                zip(jax.tree.leaves(params), jax.tree.leaves(new_params)))
    assert moved
    return new_params


@pytest.mark.slow
def test_pointnet2_partseg(inputs):
    pos, x = inputs
    model = build_model_from_cfg({
        "NAME": "BasePartSeg",
        "encoder_args": {
            "NAME": "PointNet2Encoder", "in_channels": 4,
            "mlps": [[[32, 32, 64]], [[64, 64, 128]], [[128, 128, 256]]],
            "radius": [0.2, 0.4, 0.8], "num_samples": [16, 16, 16],
            "strides": [2, 2, 2], "norm_args": {"norm": "bn"}},
        "decoder_args": {"NAME": "PointNet2PartDecoder", "in_channels": 4},
        "cls_args": {"NAME": "SegHead", "num_classes": 50,
                     "norm_args": {"norm": "bn1d"}}})
    cls0 = jnp.zeros((2, 1), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), pos, x, cls0, training=False)
    out = model.apply(v, pos, x, cls0, training=False)
    assert out.shape == (2, 128, 50)

    def loss(params):
        logits, _ = model.apply({**v, "params": params}, pos, x, cls0,
                                training=True, mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(1)})
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.zeros((2, 128), jnp.int32)).mean()
    _one_sgd_step(model, v, loss)


@pytest.mark.slow
def test_pointmlp_cls_wrapper(inputs):
    pos, x = inputs
    m = MODELS.build({"NAME": "PointMLP", "in_channels": 4, "num_classes": 15,
                      "embed_dim": 16, "dim_expansion": [2, 2],
                      "pre_blocks": [1, 1], "pos_blocks": [1, 1],
                      "k_neighbors": [8, 8], "reducers": [2, 2]})
    v = m.init(jax.random.PRNGKey(0), pos, x, training=False)
    out = m.apply(v, pos, x, training=False)
    assert out.shape == (2, 15)

    def loss(params):
        logits, _ = m.apply({**v, "params": params}, pos, x, training=True,
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.zeros((2,), jnp.int32)).mean()
    _one_sgd_step(m, v, loss)


@pytest.mark.slow
def test_pointvit_decoder(inputs):
    pos, x = inputs
    model = build_model_from_cfg({
        "NAME": "BaseSeg",
        "encoder_args": {"NAME": "PointViT", "in_channels": 4,
                         "embed_dim": 32, "depth": 2, "num_heads": 4,
                         "num_groups": 16, "group_size": 8},
        "decoder_args": {"NAME": "PointViTDecoder", "n_decoder_stages": 2,
                         "scale": 4, "global_feat": "cls,max"},
        "cls_args": {"NAME": "SegHead", "num_classes": 13,
                     "norm_args": {"norm": "bn1d"}}})
    v = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    out = model.apply(v, pos, x, training=False)
    assert out.shape == (2, 128, 13)


@pytest.mark.slow
def test_pointvit_part_decoder(inputs):
    pos, x = inputs
    model = build_model_from_cfg({
        "NAME": "BasePartSeg",
        "encoder_args": {"NAME": "PointViT", "in_channels": 4,
                         "embed_dim": 32, "depth": 2, "num_heads": 4,
                         "num_groups": 16, "group_size": 8},
        "decoder_args": {"NAME": "PointViTPartDecoder",
                         "n_decoder_stages": 2, "scale": 4,
                         "cls_map": "pointnet2"},
        "cls_args": {"NAME": "SegHead", "num_classes": 50,
                     "norm_args": {"norm": "bn1d"}}})
    cls0 = jnp.zeros((2, 1), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), pos, x, cls0, training=False)
    out = model.apply(v, pos, x, cls0, training=False)
    assert out.shape == (2, 128, 50)

    def loss(params):
        logits, _ = model.apply({**v, "params": params}, pos, x, cls0,
                                training=True, mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(1)})
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.zeros((2, 128), jnp.int32)).mean()
    _one_sgd_step(model, v, loss)


def test_distill_cls(inputs):
    pos, x = inputs
    m = build_model_from_cfg({
        "NAME": "DistillCls",
        "encoder_args": {"NAME": "PointViT", "in_channels": 4,
                         "embed_dim": 32, "depth": 2, "num_heads": 4,
                         "num_groups": 16, "group_size": 8, "distill": True},
        "cls_args": {"NAME": "ClsHead", "num_classes": 15, "mlps": [64],
                     "norm_args": {"norm": "bn1d"}},
        "distill_args": {"distill_head_args": {
            "NAME": "ClsHead", "num_classes": 15, "mlps": None}}})
    # init in training mode so the dist_head params exist (the head is only
    # traced on the training branch)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, pos, x, training=True)
    # eval: plain logits
    out = m.apply(v, pos, x, training=False)
    assert out.shape == (2, 15)
    # train: (student_logits, dist_logits) pair for DistillLoss
    (logits, dist_logits), _ = m.apply(
        v, pos, x, training=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert logits.shape == (2, 15) and dist_logits.shape == (2, 15)


def test_distill_cls_with_distill_loss(inputs):
    """DistillLoss consumes the (student, dist) pair + a teacher callable."""
    pos, x = inputs
    from adaptpoint_tpu.loss import build_criterion_from_cfg
    crit = build_criterion_from_cfg({
        "NAME": "DistillLoss", "distill_type": "hard",
        "base_criterion_args": {"NAME": "CrossEntropy"}})
    s = jnp.zeros((2, 15))
    d = jnp.ones((2, 15))
    y = jnp.zeros((2,), jnp.int32)
    loss = crit(x, (s, d), y, lambda inp: jnp.ones((2, 15)) * 0.5)
    assert jnp.isfinite(loss)


@pytest.mark.slow
def test_foldingnet(rng_np):
    m = MODELS.build({"NAME": "FoldingNet", "in_channels": 64,
                      "emb_dims": 128, "num_fine": 64, "grid_size": 2})
    code = jnp.asarray(rng_np.standard_normal((2, 64)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), None, code)
    coarse, fine = m.apply(v, None, code)
    assert coarse.shape == (2, 16, 3)
    assert fine.shape == (2, 64, 3)
    # fine points fold around their coarse centers
    centers = jnp.repeat(coarse, 4, axis=1)
    assert bool(jnp.isfinite(fine).all())

    def loss(params):
        c, f = m.apply({"params": params}, None, code)
        return jnp.sum(f ** 2) + jnp.sum(c ** 2)
    _one_sgd_step(m, v, loss)
