"""Baseline classification experiment driver (mode train/test/val/resume).

Parity with the reference trainer main
(examples/classification/train.py:52-319): build model/criterion/optimizer/
scheduler/dataloaders from cfg, run the epoch loop with val_freq validation,
best/latest checkpointing, LR stepping per epoch, and final test of last+best.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets import build_dataloader_from_cfg
from ..metricslog import Summary
from ..models import build_model_from_cfg
from ..parallel import get_mesh
from ..utils import (ConfusionMatrix, save_checkpoint, load_checkpoint,
                     set_random_seed)
from ..utils.ckpt import load_pytree, save_pytree
from .cls_trainer import (TrainState, build_train_tools, init_state,
                          make_eval_step, make_train_step, train_one_epoch,
                          validate)

__all__ = ["main", "print_cls_results"]


def write_to_csv(oa, macc, accs, best_epoch, cfg, write_header=True):
    """Append final results to <run>.csv
    (parity: train_autoaug.py:50-61 write_to_csv)."""
    import csv
    if not cfg.get("csv_path"):
        return
    classes = cfg.get("classes") or [str(i) for i in range(cfg.num_classes)]
    header = ["method", "OA", "mAcc"] + list(classes) + ["best_epoch",
                                                         "log_path"]
    row = ([cfg.get("exp_name", cfg.get("run_name", "-")), f"{oa:.3f}",
            f"{macc:.2f}"] + [f"{a:.2f}" for a in accs]
           + [str(best_epoch), cfg.get("run_dir", "-")])
    import os as _os
    new = not _os.path.exists(cfg.csv_path)
    with open(cfg.csv_path, "a", newline="") as f:
        w = csv.writer(f)
        if write_header and new:
            w.writerow(header)
        w.writerow(row)


def print_cls_results(oa, macc, accs, epoch, cfg):
    s = "\nClasses\tAcc\n"
    classes = cfg.get("classes") or [str(i) for i in range(cfg.num_classes)]
    for name, acc in zip(classes, accs):
        s += "{:10}: {:3.2f}%\n".format(name, acc)
    s += f"E@{epoch}\tOA: {oa:3.2f}\tmAcc: {macc:3.2f}\n"
    logging.info(s)


def _state_payload(state: TrainState) -> dict:
    return {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state}


def _restore_state(state: TrainState, payload: dict) -> TrainState:
    return state.replace(params=payload["params"],
                         batch_stats=payload["batch_stats"],
                         opt_state=payload.get("opt_state", state.opt_state))


def main(cfg) -> Optional[float]:
    seed = cfg.get("seed") or 0
    root_rng = set_random_seed(seed, deterministic=cfg.get("deterministic", False))
    mesh = get_mesh()
    logging.info("mesh: %s", mesh)

    model = build_model_from_cfg(cfg.model)
    if cfg.model.get("in_channels", None) is None:
        cfg.model.in_channels = cfg.model.encoder_args.in_channels

    val_loader = build_dataloader_from_cfg(
        cfg.get("val_batch_size", cfg.batch_size), cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="val", seed=seed)
    # ScanObjectNN uses the test split for val and test alike (train.py:289-303)
    try:
        test_loader = build_dataloader_from_cfg(
            cfg.get("val_batch_size", cfg.batch_size), cfg.dataset, cfg.dataloader,
            datatransforms_cfg=cfg.datatransforms, split="test", seed=seed)
    except Exception:
        test_loader = val_loader

    ds = val_loader.dataset
    if hasattr(ds, "classes"):
        cfg.classes = list(ds.classes)

    example = next(iter(val_loader))
    criterion, tx, lr_fn = build_train_tools(cfg, model)
    # tx needs params for the wd mask: rebuild with real params below
    rng, init_rng = jax.random.split(root_rng)
    tx_probe = tx
    state = init_state(cfg, model, tx_probe, init_rng, example)
    criterion, tx, lr_fn = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logging.info("Number of params: %.4f M", n_params / 1e6)

    train_step = make_train_step(model, tx, criterion, cfg)
    eval_step = make_eval_step(model, cfg)
    train_step_scan = None
    if int(cfg.get("scan_batches", 1) or 1) > 1:
        from .cls_trainer import make_train_step_scan
        train_step_scan = make_train_step_scan(model, tx, criterion, cfg)

    mode = cfg.get("mode", "train")
    if cfg.get("pretrained_path"):
        payload, epoch_loaded, best_val = load_checkpoint(
            _state_payload(state), cfg.pretrained_path)
        state = _restore_state(state, payload)
        if mode in ("test", "val"):
            loader = test_loader if mode == "test" else val_loader
            macc, oa, accs, cm = validate(eval_step, state, loader, mesh, cfg)
            print_cls_results(oa, macc, accs, epoch_loaded, cfg)
            return oa
        if mode == "resume":
            cfg.start_epoch = epoch_loaded + 1
            # checkpoints converted from the reference with --optimizer
            # carry the torch Adam moments as 'opt_moments' (they cannot
            # ride 'opt_state': that tree is optax-structure-specific)
            from ..utils.ckpt import maybe_splice_opt_moments
            state = state.replace(opt_state=maybe_splice_opt_moments(
                state.opt_state, cfg.pretrained_path))

    train_loader = build_dataloader_from_cfg(
        cfg.batch_size, cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="train", seed=seed)
    logging.info("train size %d, val size %d",
                 len(train_loader.dataset), len(val_loader.dataset))

    summary = Summary(cfg.get("run_dir"))
    best_val, macc_when_best, best_epoch = 0.0, 0.0, 0
    val_macc = val_oa = 0.0
    for epoch in range(cfg.get("start_epoch", 1), cfg.epochs + 1):
        train_loader.set_epoch(epoch)
        lr = lr_fn(epoch - 1)
        rng, erng = jax.random.split(rng)
        state, train_loss, train_macc, train_oa, _, _ = train_one_epoch(
            train_step, state, train_loader, mesh, erng, lr, cfg,
            train_step_scan=train_step_scan)

        is_best = False
        if epoch % cfg.val_freq == 0:
            val_macc, val_oa, val_accs, _ = validate(
                eval_step, state, val_loader, mesh, cfg)
            if hasattr(lr_fn, "record"):  # plateau scheduler
                lr_fn.record(val_oa)
            is_best = val_oa > best_val
            if is_best:
                best_val, macc_when_best, best_epoch = val_oa, val_macc, epoch
                logging.info("Find a better ckpt @E%d", epoch)
                print_cls_results(val_oa, val_macc, val_accs, epoch, cfg)

        logging.info("Epoch %d LR %.6f train_oa %.2f val_oa %.2f best %.2f",
                     epoch, lr, train_oa, val_oa, best_val)
        summary.add_scalar("train_loss", train_loss, epoch)
        summary.add_scalar("train_oa", train_oa, epoch)
        summary.add_scalar("lr", lr, epoch)
        summary.add_scalar("val_oa", val_oa, epoch)
        summary.add_scalar("best_val", best_val, epoch)
        if cfg.get("run_name"):
            save_checkpoint(cfg, _state_payload(state), epoch,
                            is_best=is_best, additional={"best_val": best_val})

    # final: test last, then best (train.py:306-319)
    test_macc, test_oa, test_accs, _ = validate(eval_step, state, test_loader, mesh, cfg)
    print_cls_results(test_oa, test_macc, test_accs, cfg.epochs, cfg)
    write_to_csv(test_oa, test_macc, test_accs, best_epoch, cfg)

    if cfg.get("use_voting", False):
        from .cls_trainer import make_vote_eval_step
        from ..parallel import shard_batch as _shard
        vote_step = make_vote_eval_step(model, cfg)
        cm = ConfusionMatrix(num_classes=cfg.num_classes)
        vrng = jax.random.PRNGKey(cfg.get("seed") or 0)
        for batch in test_loader:
            n_valid = int(batch.pop("n_valid", len(batch["y"])))
            vrng, sub = jax.random.split(vrng)
            preds = np.asarray(vote_step(state, _shard(mesh, batch), sub))
            cm.update(preds[:n_valid], batch["y"][:n_valid])
        vmacc, voa, vaccs = cm.all_acc()
        logging.info("voting eval: OA %.2f mAcc %.2f", voa, vmacc)
    if cfg.get("run_name"):
        best_path = os.path.join(cfg.ckpt_dir, f"{cfg.run_name}_ckpt_best.msgpack")
        if os.path.exists(best_path):
            payload, e, _ = load_checkpoint(_state_payload(state), best_path)
            state = _restore_state(state, payload)
            test_macc, test_oa, test_accs, _ = validate(
                eval_step, state, test_loader, mesh, cfg)
            print_cls_results(test_oa, test_macc, test_accs, e, cfg)
    summary.close()
    return best_val
