"""Checkpoint save/load/tolerant-restore roundtrip with a real optax state."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from adaptpoint_tpu.utils import EasyConfig, load_checkpoint, save_checkpoint
from adaptpoint_tpu.utils.ckpt import load_pytree, save_pytree


def make_state():
    params = {"dense": {"kernel": jnp.ones((4, 8)), "bias": jnp.zeros(8)},
              "bn": {"scale": jnp.ones(8)}}
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3))
    opt_state = tx.init(params)
    return {"params": params, "batch_stats": {"bn": {"mean": jnp.zeros(8)}},
            "opt_state": opt_state}


def test_roundtrip(tmp_path):
    cfg = EasyConfig()
    cfg.update({"run_name": "t", "ckpt_dir": str(tmp_path), "save_freq": -1})
    state = make_state()
    path = save_checkpoint(cfg, state, epoch=3, is_best=True,
                           additional={"best_val": 0.5})
    assert os.path.exists(path)
    assert os.path.exists(str(tmp_path / "t_ckpt_best.msgpack"))

    target = make_state()
    target["params"]["dense"]["kernel"] = jnp.zeros((4, 8))
    merged, epoch, best_val = load_checkpoint(target, path)
    assert epoch == 3 and abs(best_val - 0.5) < 1e-9
    assert np.allclose(np.asarray(merged["params"]["dense"]["kernel"]), 1.0)


def test_tolerant_partial_load(tmp_path):
    state = make_state()
    p = str(tmp_path / "x.msgpack")
    save_pytree({"params": state["params"]}, p)
    target = make_state()
    # extra key in target -> reported missing, kept from target
    target["params"]["extra"] = {"w": jnp.full((2,), 7.0)}
    merged, _, _ = load_checkpoint(target, p)
    assert np.allclose(np.asarray(merged["params"]["extra"]["w"]), 7.0)
    assert np.allclose(np.asarray(merged["params"]["dense"]["kernel"]), 1.0)
    # shape mismatch -> skipped, target kept
    target2 = make_state()
    target2["params"]["dense"]["kernel"] = jnp.zeros((5, 8))
    merged2, _, _ = load_checkpoint(target2, p)
    assert merged2["params"]["dense"]["kernel"].shape == (5, 8)
