"""AdaptPoint subsystem tests: augmentor, discriminator, pointwolf, feedback."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptpoint_tpu.adapt import (
    ADAPTMODELS, build_adaptpointmodels_from_cfg, PointWOLF, pointwolf,
    feedback_loss, update_hardratio, FormDatasetCls, gumbel_softmax,
    normalize_cloud, random_axis)


@pytest.fixture
def cloud(rng_np):
    return jnp.asarray(rng_np.standard_normal((2, 128, 3)), jnp.float32)


def test_random_axis_values():
    bits = np.asarray(random_axis(jax.random.PRNGKey(0), 64, 2))
    assert bits.shape == (64, 2, 3)
    assert set(np.unique(bits)) <= {0.0, 1.0}
    assert (bits.sum(-1) >= 1).all()  # never the empty axis set


def test_normalize_cloud_unit_sphere(cloud):
    out = np.asarray(normalize_cloud(cloud))
    r = np.sqrt((out ** 2).sum(-1)).max(axis=-1)
    assert (r <= 1.0 + 1e-5).all()
    assert np.allclose(out.mean(axis=1), 0, atol=1e-5)


def test_pointwolf_shapes_and_range(cloud):
    raw, new = pointwolf(jax.random.PRNGKey(0), cloud)
    assert new.shape == cloud.shape
    assert raw is cloud or np.allclose(np.asarray(raw), np.asarray(cloud))
    r = np.sqrt((np.asarray(new) ** 2).sum(-1)).max()
    assert r <= 1.0 + 1e-5
    # different rng -> different deformation
    _, new2 = pointwolf(jax.random.PRNGKey(1), cloud)
    assert not np.allclose(np.asarray(new), np.asarray(new2))


def test_gumbel_softmax_hard_straight_through():
    logits = jnp.array([[2.0, -1.0], [0.5, 0.4]])
    y = gumbel_softmax(jax.random.PRNGKey(0), logits, tau=0.1, hard=True)
    arr = np.asarray(y)
    assert np.allclose(arr.sum(-1), 1.0)
    assert set(np.unique(arr)) <= {0.0, 1.0}

    def f(l):
        return gumbel_softmax(jax.random.PRNGKey(0), l, tau=0.1, hard=True).sum()

    g = jax.grad(f)(logits)  # straight-through: nonzero grads flow
    assert np.asarray(jnp.abs(g)).sum() > 0


@pytest.mark.slow
def test_augmentor_forward(cloud):
    gen = build_adaptpointmodels_from_cfg({
        "NAME": "AdaptPoint_Augmentor", "w_num_anchor": 4, "w_sigma": 0.5,
        "w_R_range": 10, "w_S_range": 3, "w_T_range": 0.25})
    rngs = {"params": jax.random.PRNGKey(0), "wolf": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    variables = gen.init(rngs, cloud, training=False)
    raw, new = gen.apply(variables, cloud, training=True,
                         rngs={"wolf": jax.random.PRNGKey(3),
                               "gumbel": jax.random.PRNGKey(4)},
                         mutable=["batch_stats"])[0]
    assert new.shape == cloud.shape
    # masked points are exactly zero or inside the unit sphere
    r = np.sqrt((np.asarray(new) ** 2).sum(-1))
    assert (r <= 1.0 + 1e-4).all()


@pytest.mark.slow
def test_augmentor_grads_flow(cloud):
    gen = build_adaptpointmodels_from_cfg({"NAME": "AdaptPoint_Augmentor"})
    rngs = {"params": jax.random.PRNGKey(0), "wolf": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    variables = gen.init(rngs, cloud, training=False)

    def loss_fn(params):
        (raw, new), _ = gen.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            cloud, training=True,
            rngs={"wolf": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)},
            mutable=["batch_stats"])
        return jnp.sum(new ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0, "no gradient flows into the controller"


def test_discriminator_forward(cloud):
    dis = build_adaptpointmodels_from_cfg({
        "NAME": "PointDiscriminator1", "num_classes": 15,
        "normal_channel": False})
    variables = dis.init(jax.random.PRNGKey(0), cloud, training=False)
    prob = dis.apply(variables, cloud, training=False)
    arr = np.asarray(prob)
    assert arr.shape == (2, 1)
    assert ((arr > 0) & (arr < 1)).all()
    # spectral norm power-iteration state updates when training
    _, updates = dis.apply(variables, cloud, training=True,
                           rngs={"dropout": jax.random.PRNGKey(1)},
                           mutable=["batch_stats"])
    assert "batch_stats" in updates


def test_feedback_loss_semantics():
    assert update_hardratio(3.0, 3.0, 10, 100) == 3.0
    assert update_hardratio(1.0, 2.0, 50, 100) == 1.5
    # fake exactly ratio*real -> zero loss
    assert float(feedback_loss(jnp.float32(2.0), jnp.float32(1.0), 2.0)) == 0.0
    assert float(feedback_loss(jnp.float32(3.0), jnp.float32(1.0), 2.0)) > 0


def test_form_dataset_cls():
    pc = [np.zeros((4, 128, 3), np.float32), np.ones((2, 128, 3), np.float32)]
    y = [np.zeros(4, np.int64), np.ones(2, np.int64)]
    x = [np.zeros((4, 128, 4), np.float32), np.ones((2, 128, 4), np.float32)]
    ds = FormDatasetCls(pc, y, x)
    assert len(ds) == 6
    s = ds.get(5)
    assert s["pos"].shape == (128, 3) and s["x"].shape == (128, 4)
    assert s["y"] == 1


@pytest.mark.slow
def test_gan_step_fps_shortcuts_equivalence(rng_np):
    """gan_step output is identical with the FPS prefix shortcuts
    (nested-FPS arange + shared raw-cloud FPS) on vs off — both are
    instances of the greedy-FPS prefix identity."""
    import os
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.parallel import get_mesh, shard_batch
    from adaptpoint_tpu.engine.cls_trainer import (build_train_tools,
                                                   init_state)
    from adaptpoint_tpu.engine.adapt_trainer import build_gan, make_gan_step

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = EasyConfig()
    cfg.load(os.path.join(
        repo, "cfgs/synthetic/pointnext-tiny_adaptpoint.yaml"),
        recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    mesh = get_mesh()
    B, N = 8, 128
    batch = {"x": rng_np.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng_np.integers(0, cfg.num_classes, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    generator, discriminator, tx_g, tx_d, gan_state = build_gan(
        cfg, jnp.asarray(batch["x"][:2, :, :3]), key)
    sb = shard_batch(mesh, batch)

    outs = {}
    old = os.environ.get("ADAPTPOINT_TPU_NESTED_FPS")
    try:
        for flag in ("1", "0"):
            os.environ["ADAPTPOINT_TPU_NESTED_FPS"] = flag
            gan_step = make_gan_step(generator, discriminator, tx_g, tx_d,
                                     model, cfg)
            st, gen, metrics = gan_step(gan_state, state, sb, key,
                                        jnp.float32(3.0))
            outs[flag] = (np.asarray(gen),
                          {k: float(v) for k, v in metrics.items()})
    finally:
        if old is None:
            os.environ.pop("ADAPTPOINT_TPU_NESTED_FPS", None)
        else:
            os.environ["ADAPTPOINT_TPU_NESTED_FPS"] = old
    assert np.allclose(outs["1"][0], outs["0"][0], atol=1e-6)
    for k in outs["1"][1]:
        assert np.allclose(outs["1"][1][k], outs["0"][1][k], atol=1e-5), k
