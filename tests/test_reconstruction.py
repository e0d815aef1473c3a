"""MAE pretraining subsystem: masking, NodeShuffle decoder, loss decreases."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.models.reconstruction.masked_point import random_masking

MAE_CFG = {
    "NAME": "MaskedPoint",
    "backbone_args": {"NAME": "DGCNN", "in_channels": 3, "channels": 8,
                      "embed_dim": 32, "n_blocks": 3, "k": 8, "is_seg": True},
    "decoder_args": {"NAME": "NodeShuffle", "up_ratio": 4, "k": 8,
                     "channels": 32},
    "mask_ratio": 0.75,
}


def test_random_masking():
    xyz = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3)),
                      jnp.float32)
    xm, mask, ids_restore, ids_keep = random_masking(jax.random.PRNGKey(0),
                                                     xyz, 0.75)
    assert xm.shape == (2, 16, 3)
    assert mask.shape == (2, 64)
    m = np.asarray(mask)
    assert np.allclose(m.sum(1), 48)  # 75% masked
    # kept points marked 0 at their original positions
    for b in range(2):
        assert (m[b][np.asarray(ids_keep)[b]] == 0).all()


@pytest.mark.slow
def test_masked_point_forward_and_grad(rng_np):
    model = build_model_from_cfg(MAE_CFG)
    xyz = jnp.asarray(rng_np.standard_normal((2, 64, 3)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}
    variables = model.init(rngs, xyz, training=True)

    def loss_fn(params):
        (loss, pred), _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            xyz, training=True, rngs={"masking": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return loss

    loss = loss_fn(variables["params"])
    assert float(loss) > 0
    g = jax.grad(loss_fn)(variables["params"])
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert gn > 0


def test_masked_pointvit_forward(rng_np):
    model = build_model_from_cfg({
        "NAME": "MaskedPointViT", "num_groups": 16, "group_size": 8,
        "embed_dim": 32, "depth": 2, "num_heads": 4, "mask_ratio": 0.5,
        "decoder_args": {"NAME": "MaskedTransformerDecoder",
                         "decoder_embed_dim": 32, "decoder_depth": 1,
                         "decoder_num_heads": 4}})
    xyz = jnp.asarray(rng_np.standard_normal((2, 128, 3)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}
    v = model.init(rngs, xyz, training=True)
    (loss, pred), _ = model.apply(
        v, xyz, training=True, rngs={"masking": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert float(loss) > 0
    assert pred.shape == (2, 8 * 8, 3)  # masked groups x group_size


@pytest.mark.slow
def test_masked_point_group(rng_np):
    from adaptpoint_tpu.models import build_model_from_cfg
    m = build_model_from_cfg({
        "NAME": "MaskedPointGroup",
        "encoder_args": {"embed_dim": 32, "depth": 1, "num_heads": 2},
        "decoder_args": {"embed_dim": 32, "depth": 1, "num_heads": 2},
        "mask_ratio": 0.75, "group_size": 8, "sample_ratio": 0.25})
    xyz = jnp.asarray(rng_np.standard_normal((2, 64, 3)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0),
                "masking": jax.random.PRNGKey(1)}, xyz)
    loss, pred = m.apply(v, xyz, rngs={"masking": jax.random.PRNGKey(2)})
    assert jnp.isfinite(loss) and pred.shape == (2, 16 * 8, 3)
    g = jax.grad(lambda p: m.apply({"params": p}, xyz,
                                   rngs={"masking": jax.random.PRNGKey(2)})[0]
                 )(v["params"])
    assert all(bool(jnp.isfinite(a).all()) for a in jax.tree.leaves(g))
