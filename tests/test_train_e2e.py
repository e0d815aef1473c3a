"""End-to-end slice: config -> model -> data -> jit'd sharded train loop ->
metrics, on the 8-virtual-device CPU mesh (SURVEY.md §7 step 4)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.datasets import build_dataloader_from_cfg
from adaptpoint_tpu.parallel import get_mesh
from adaptpoint_tpu.engine.cls_trainer import (
    build_train_tools, init_state, make_eval_step, make_train_step,
    train_one_epoch, validate, resample_points)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_cfg(name):
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, f"cfgs/synthetic/{name}.yaml"), recursive=True)
    return cfg


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("model_name", [
    "dgcnn-tiny",
    pytest.param("pointnext-tiny", marks=pytest.mark.slow)])
def test_train_loop_learns(model_name):
    cfg = load_cfg(model_name)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    mesh = get_mesh()
    assert mesh.size == 8

    train_loader = build_dataloader_from_cfg(
        cfg.batch_size, cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="train", seed=0)
    val_loader = build_dataloader_from_cfg(
        cfg.val_batch_size, cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="val", seed=0)

    example = next(iter(train_loader))
    assert example["x"].shape == (16, 128, 4)

    criterion, tx, lr_fn = build_train_tools(cfg, model)
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, model, tx, rng, example)
    criterion, tx, lr_fn = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    train_step = make_train_step(model, tx, criterion, cfg)
    eval_step = make_eval_step(model, cfg)

    losses, train_oa = [], 0.0
    for epoch in range(1, cfg.epochs + 1):
        train_loader.set_epoch(epoch)
        rng, erng = jax.random.split(rng)
        state, loss, macc, train_oa, accs, _ = train_one_epoch(
            train_step, state, train_loader, mesh, erng, lr_fn(epoch - 1), cfg)
        losses.append(loss)
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # learns well past chance in a few epochs (val OA lags: BN running stats)
    assert train_oa > 2 * 100.0 / cfg.num_classes, f"train_oa {train_oa}"

    macc, oa, accs, cm = validate(eval_step, state, val_loader, mesh, cfg)
    assert cm.total == len(val_loader.dataset)


def test_resample_points_semantics():
    rng = jax.random.PRNGKey(0)
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 2048, 4)),
                      jnp.float32)
    out = resample_points(rng, pts, 1024)
    assert out.shape == (2, 1024, 4)
    # resampled points are a subset of the originals
    orig = set(map(tuple, np.asarray(pts[0]).round(4)))
    new = set(map(tuple, np.asarray(out[0]).round(4)))
    assert new.issubset(orig)
    # no-op when already small enough
    small = pts[:, :512]
    assert resample_points(rng, small, 1024) is small


def test_train_step_scan_matches_sequential():
    """The lax.scan multi-batch executor == K sequential steps with the
    same fold_in(rng, i) substream (bitwise on CPU)."""
    import jax
    import jax.numpy as jnp
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.engine.cls_trainer import (
        build_train_tools, init_state, make_train_step,
        make_train_step_scan)

    rng_np = np.random.default_rng(0)
    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, "cfgs/synthetic/dgcnn-tiny.yaml"),
             recursive=True)
    model = build_model_from_cfg(cfg.model)
    B, N = int(cfg.batch_size), int(cfg.num_points)
    batches = [{"x": rng_np.standard_normal((B, N, 3)).astype(np.float32),
                "y": rng_np.integers(0, cfg.num_classes, B).astype(np.int64)}
               for _ in range(3)]
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batches[0])
    criterion, tx, _ = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, criterion, cfg)
    scan = make_train_step_scan(model, tx, criterion, cfg)
    lr = jnp.float32(cfg.lr)
    rng = jax.random.PRNGKey(7)

    st_seq = state
    seq_losses = []
    for i, b in enumerate(batches):
        st_seq, loss, _ = step(st_seq, {k: jnp.asarray(v)
                                        for k, v in b.items()},
                               jax.random.fold_in(rng, i), lr)
        seq_losses.append(float(loss))

    stacked = {k: jnp.asarray(np.stack([b[k] for b in batches]))
               for k in batches[0]}
    st_scan, losses, _ = scan(state, stacked, rng, lr)
    assert np.allclose(np.asarray(losses), np.asarray(seq_losses), atol=0)
    for a, b in zip(jax.tree.leaves(st_seq.params),
                    jax.tree.leaves(st_scan.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
