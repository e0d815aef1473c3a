"""Baseline training with periodic corruption evaluation
(``mode: scanobjectnnc`` / ``modelnetc``) and the pointwolf / rsmix / wolfmix
augmentation baselines.

Parity: examples/classification/train_scanobjectnnc.py:54-369 (epoch-variant
dispatch on cfg keys pointwolf / rsmix_params / wolfmix; corruption sweep
every 20 epochs and on the final best+latest) and
examples/classification/train_pointwolf_utils.py:25-269 (the three epoch
variants). PointWOLF runs on-device inside the jit'd step; RSMix mixes on the
host like the reference (its own implementation is numpy).
"""
from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..adapt.pointwolf import pointwolf
from ..adapt.rsmix import rsmix
from ..datasets import build_dataloader_from_cfg, eval_corrupt_wrapper
from ..datasets.modelnet import (DGCNN_OA_MODELNET_C, ModelNetC,
                                 eval_corrupt_wrapper_modelnetc)
from ..loss import build_criterion_from_cfg
from ..metricslog import Summary
from ..models import build_model_from_cfg
from ..parallel import get_mesh, shard_batch
from ..utils import AverageMeter, ConfusionMatrix, PipelinedFetcher, \
    load_checkpoint, \
    save_checkpoint, set_random_seed
from .adapt_main import validate_scanobjectnnc
from .cls_main import _restore_state, _state_payload, print_cls_results
from .cls_trainer import (build_train_tools, init_state, make_eval_step,
                          make_train_step, resample_points, set_lr,
                          train_one_epoch, validate)

__all__ = ["main"]


def make_train_step_pointwolf(model, tx, criterion, cfg):
    """Standard step with on-device PointWOLF applied to xyz first
    (parity: train_pointwolf_utils.py:25-88)."""
    npoints = int(cfg.num_points)
    in_channels = int(cfg.model.get("in_channels", None)
                      or cfg.model.encoder_args.in_channels)
    pw = dict(cfg.pointwolf)

    @jax.jit
    def train_step(state, batch, rng, lr):
        r_wolf, r_fps, r_drop = jax.random.split(rng, 3)
        points = batch["x"]
        _, new_xyz = pointwolf(r_wolf, points[..., :3],
                               int(pw.get("w_num_anchor", 4)),
                               float(pw.get("w_sigma", 0.5)),
                               float(pw.get("w_R_range", 10)),
                               float(pw.get("w_S_range", 3)),
                               float(pw.get("w_T_range", 0.25)))
        points = jnp.concatenate([new_xyz, points[..., 3:]], axis=-1)
        points = resample_points(r_fps, points, npoints)
        pos, x, y = points[..., :3], points[..., :in_channels], batch["y"]

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pos, x, training=True, rngs={"dropout": r_drop},
                mutable=["batch_stats"])
            return criterion(logits, y), (logits, updates["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, batch_stats=new_bs,
                              opt_state=opt_state, step=state.step + 1),
                loss, jnp.argmax(logits, -1))

    return train_step


def make_train_step_mixed(model, tx, criterion, cfg):
    """Step with two-label lambda-mixed loss for RSMix
    (parity: train_pointwolf_utils.py:150-157)."""
    npoints = int(cfg.num_points)
    in_channels = int(cfg.model.get("in_channels", None)
                      or cfg.model.encoder_args.in_channels)

    @jax.jit
    def train_step(state, batch, rng, lr):
        r_fps, r_drop = jax.random.split(rng)
        points = resample_points(r_fps, batch["x"], npoints)
        pos, x = points[..., :3], points[..., :in_channels]
        y_a, y_b, lam = batch["y"], batch["y_b"], batch["lam"]

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pos, x, training=True, rngs={"dropout": r_drop},
                mutable=["batch_stats"])
            la = criterion.per_sample(logits, y_a)
            lb = criterion.per_sample(logits, y_b)
            loss = jnp.mean((1.0 - lam) * la + lam * lb)
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, batch_stats=new_bs,
                              opt_state=opt_state, step=state.step + 1),
                loss, jnp.argmax(logits, -1))

    return train_step


def train_one_epoch_rsmix(train_step_mixed, state, loader, mesh, rng, lr, cfg,
                          apply_pointwolf=False):
    """RSMix (and WolfMix) epoch: host-side mixing, device step
    (parity: train_pointwolf_utils.py:90-269). WolfMix nests its params under
    cfg.wolfmix (cfgs/scanobjectnn/pointnext-s_valcorruption_wwolfmix.yaml)."""
    loss_meter = AverageMeter()
    cm = ConfusionMatrix(num_classes=cfg.num_classes)
    params = (cfg.wolfmix.rsmix_params if apply_pointwolf
              else cfg.rsmix_params)
    lr = jnp.asarray(lr, jnp.float32)
    np_rng = np.random.default_rng(int(jax.random.randint(rng, (), 0, 2 ** 31 - 1)))
    fetch = PipelinedFetcher()

    def record(fetched, y_a):
        loss, preds = fetched
        cm.update(preds, y_a)
        loss_meter.update(float(loss))

    for batch in loader:
        rng, sub = jax.random.split(rng)
        points = np.asarray(batch["x"])
        if apply_pointwolf:
            rng, rw = jax.random.split(rng)
            pw = dict(cfg.wolfmix.pointwolf)
            _, new_xyz = pointwolf(rw, jnp.asarray(points[..., :3]),
                                   int(pw.get("w_num_anchor", 4)),
                                   float(pw.get("w_sigma", 0.5)),
                                   float(pw.get("w_R_range", 10)),
                                   float(pw.get("w_S_range", 3)),
                                   float(pw.get("w_T_range", 0.25)))
            points = points.copy()
            points[..., :3] = np.asarray(new_xyz)
        y = np.asarray(batch["y"])
        r = np_rng.random()
        if params.beta > 0 and r < params.rsmix_prob:
            mixed, lam, y_a, y_b = rsmix(points, y, beta=params.beta,
                                         n_sample=params.nsample,
                                         knn=params.knn, rng=np_rng)
        else:
            mixed, lam, y_a, y_b = points, np.zeros(len(y), np.float32), y, y
        sb = shard_batch(mesh, {"x": mixed.astype(np.float32),
                                "y": y_a.astype(np.int64),
                                "y_b": y_b.astype(np.int64),
                                "lam": lam.astype(np.float32)})
        state, loss, preds = train_step_mixed(state, sb, sub, lr)
        fetch.push((loss, preds), record, y_a)
    fetch.flush()
    macc, oa, accs = cm.all_acc()
    return state, loss_meter.avg, macc, oa, accs, cm


def _corruption_eval(cfg, eval_step, state, mesh, epoch):
    mode = cfg.get("mode", "scanobjectnnc")
    try:
        if mode == "modelnetc":
            eval_corrupt_wrapper_modelnetc(
                {"eval_step": eval_step, "state": state, "mesh": mesh,
                 "cfg": cfg}, cfg.get("run_dir"), epoch)
        else:
            eval_corrupt_wrapper(
                validate_scanobjectnnc,
                {"eval_step": eval_step, "state": state, "mesh": mesh,
                 "cfg": cfg},
                cfg.get("run_dir"), epoch)
    except FileNotFoundError as e:
        logging.warning("skipping corruption eval: %s", e)


def main(cfg):
    seed = cfg.get("seed") or 0
    rng = set_random_seed(seed)
    mesh = get_mesh()

    model = build_model_from_cfg(cfg.model)
    if cfg.model.get("in_channels", None) is None:
        cfg.model.in_channels = cfg.model.encoder_args.in_channels

    val_loader = build_dataloader_from_cfg(
        cfg.get("val_batch_size", cfg.batch_size), cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="val", seed=seed)
    if hasattr(val_loader.dataset, "classes"):
        cfg.classes = list(val_loader.dataset.classes)

    example = next(iter(val_loader))
    rng, init_rng = jax.random.split(rng)
    criterion, tx, lr_fn = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, init_rng, example)
    criterion, tx, lr_fn = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    eval_step = make_eval_step(model, cfg)

    if cfg.get("pretrained_path") and cfg.get("test"):
        payload, epoch_loaded, _ = load_checkpoint(
            _state_payload(state), cfg.pretrained_path)
        state = _restore_state(state, payload)
        _corruption_eval(cfg, eval_step, state, mesh, epoch_loaded)
        return

    # resume=True continues the corruption-mode trainer at epoch+1
    # (reference resume_checkpoint semantics, train_scanobjectnnc.py)
    resumed_best = 0.0
    if cfg.get("resume") and cfg.get("pretrained_path"):
        payload, epoch_loaded, resumed_best = load_checkpoint(
            _state_payload(state), cfg.pretrained_path)
        state = _restore_state(state, payload)
        from ..utils.ckpt import maybe_splice_opt_moments
        state = state.replace(opt_state=maybe_splice_opt_moments(
            state.opt_state, cfg.pretrained_path))
        cfg.start_epoch = epoch_loaded + 1
        logging.info("resumed from %s at epoch %d (best %.3f)",
                     cfg.pretrained_path, epoch_loaded, resumed_best)

    train_loader = build_dataloader_from_cfg(
        cfg.batch_size, cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="train", seed=seed)

    use_pointwolf = cfg.get("pointwolf") is not None and cfg.get("wolfmix") is None
    use_rsmix = cfg.get("rsmix_params") is not None and cfg.get("wolfmix") is None
    use_wolfmix = cfg.get("wolfmix") is not None

    train_step = make_train_step(model, tx, criterion, cfg)
    train_step_pw = (make_train_step_pointwolf(model, tx, criterion, cfg)
                     if use_pointwolf else None)
    train_step_mixed = (make_train_step_mixed(model, tx, criterion, cfg)
                        if (use_rsmix or use_wolfmix) else None)

    summary = Summary(cfg.get("run_dir"))
    best_val, best_epoch, val_oa = float(resumed_best or 0.0), 0, 0.0
    for epoch in range(cfg.get("start_epoch", 1), cfg.epochs + 1):
        train_loader.set_epoch(epoch)
        lr = lr_fn(epoch - 1)
        rng, erng = jax.random.split(rng)
        if use_pointwolf:
            state, train_loss, train_macc, train_oa, _, _ = train_one_epoch(
                train_step_pw, state, train_loader, mesh, erng, lr, cfg)
        elif use_rsmix or use_wolfmix:
            state, train_loss, train_macc, train_oa, _, _ = train_one_epoch_rsmix(
                train_step_mixed, state, train_loader, mesh, erng, lr, cfg,
                apply_pointwolf=use_wolfmix)
        else:
            state, train_loss, train_macc, train_oa, _, _ = train_one_epoch(
                train_step, state, train_loader, mesh, erng, lr, cfg)

        if (epoch + 1) % 20 == 0:
            _corruption_eval(cfg, eval_step, state, mesh, epoch)

        is_best = False
        if epoch % cfg.val_freq == 0:
            val_macc, val_oa, val_accs, _ = validate(
                eval_step, state, val_loader, mesh, cfg)
            is_best = val_oa > best_val
            if is_best:
                best_val, best_epoch = val_oa, epoch
                print_cls_results(val_oa, val_macc, val_accs, epoch, cfg)
        logging.info("Epoch %d LR %.6f train_oa %.2f val_oa %.2f best %.2f",
                     epoch, lr, train_oa, val_oa, best_val)
        summary.add_scalar("train_oa", train_oa, epoch)
        summary.add_scalar("val_oa", val_oa, epoch)
        if cfg.get("run_name"):
            save_checkpoint(cfg, _state_payload(state), epoch,
                            is_best=is_best, additional={"best_val": best_val})

    # final corruption sweeps on best + latest (train_scanobjectnnc.py:243-246)
    if cfg.get("run_name"):
        for tag in ("best", "latest"):
            path = os.path.join(cfg.ckpt_dir,
                                f"{cfg.run_name}_ckpt_{tag}.msgpack")
            if os.path.exists(path):
                payload, e, _ = load_checkpoint(_state_payload(state), path)
                state = _restore_state(state, payload)
                _corruption_eval(cfg, eval_step, state, mesh, f"final_{tag}")
    summary.close()
    return best_val
