"""Scene-segmentation training/eval (S3DIS).

Parity: examples/segmentation/main.py:112-730 core path — BaseSeg model over
voxel-cropped rooms, weighted/smooth CE, per-epoch mIoU/OA/mAcc via the
confusion matrix (get_mious), best-ckpt tracking. The reference's AMP path is
TPU-native bf16 matmuls by default; sphere-subsampling eval and 6-fold
cross-validation are driven by cfg like the reference.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from ..datasets import build_dataloader_from_cfg
from ..datasets.data_util import get_class_weights
from ..loss import build_criterion_from_cfg
from ..metricslog import Summary
from ..models import build_model_from_cfg
from ..optim import build_optimizer_from_cfg
from ..parallel import get_mesh, shard_batch
from ..scheduler import build_scheduler_from_cfg
from ..utils import (AverageMeter, ConfusionMatrix, PipelinedFetcher,
                     get_mious, load_checkpoint,
                     save_checkpoint, set_random_seed)
from .cls_main import _restore_state, _state_payload
from .cls_trainer import TrainState, set_lr

__all__ = ["main"]


def _features(batch, cfg):
    keys = cfg.get("feature_keys", "pos,heights")
    parts = []
    for k in keys.split(","):
        if k == "pos":
            parts.append(batch["pos"])
        elif k == "heights":
            parts.append(batch["heights"])
        elif k == "x":
            parts.append(batch["x"])
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def make_seg_steps(model, tx, criterion, cfg):
    @jax.jit
    def train_step(state: TrainState, batch, rng, lr):
        pos = batch["pos"]
        x = _features(batch, cfg)
        y = batch["y"]

        use_mask = ("mask" in cfg.get("criterion_args", {}).get(
            "NAME", "").lower() and "mask" in batch)

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pos, x, training=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            # sphere batches: padded points excluded via MaskedCrossEntropy
            # (parity: examples/segmentation/main.py:354-355)
            loss = (criterion(logits, y, batch["mask"]) if use_mask
                    else criterion(logits, y))
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, batch_stats=new_bs,
                              opt_state=opt_state, step=state.step + 1),
                loss, jnp.argmax(logits, -1))

    @jax.jit
    def eval_step(state: TrainState, batch):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["pos"], _features(batch, cfg), training=False)
        return jnp.argmax(logits, -1)

    return train_step, eval_step


def validate_seg(eval_step, state, loader, mesh, cfg):
    cm = ConfusionMatrix(num_classes=cfg.num_classes,
                         ignore_index=cfg.get("ignore_index"))
    fetch = PipelinedFetcher()

    def record(preds, y, n_valid):
        cm.update(preds[:n_valid], y[:n_valid])

    for batch in loader:
        n_valid = int(batch.pop("n_valid", len(batch["y"])))
        sb = shard_batch(mesh, batch, pad_to_mesh=True)
        fetch.push(eval_step(state, sb), record, np.asarray(batch["y"]),
                   n_valid)
    fetch.flush()
    miou, macc, oa, ious, accs = get_mious(cm.tp, cm.union, cm.count)
    return miou, macc, oa, ious, accs


def make_sphere_logits_step(model, cfg):
    """Eval step that returns raw logits (for sphere vote accumulation)."""
    @jax.jit
    def logits_step(state: TrainState, batch):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["pos"], _features(batch, cfg), training=False)
    return logits_step


def validate_sphere(logits_step, state, loader, mesh, cfg):
    """Sphere-overlap validation (parity:
    examples/segmentation/main.py:433-506 validate_sphere): average logits of
    overlapping sphere predictions onto the subsampled cloud, project to the
    original points via the dataset's precomputed nearest-subpoint indices,
    then score. Scatter-mean is a host-side np.add.at (one pass, tiny next to
    the model forwards)."""
    ds = loader.dataset
    sums = [np.zeros((p.shape[0], cfg.num_classes), np.float64)
            for p in ds.sub_points]
    counts = [np.zeros(p.shape[0], np.int64) for p in ds.sub_points]
    fetch = PipelinedFetcher()

    def accumulate(logits, inds, clouds, n_valid):
        for b in range(n_valid):
            ci = int(clouds[b])
            np.add.at(sums[ci], inds[b], logits[b])
            np.add.at(counts[ci], inds[b], 1)

    for batch in loader:
        n_valid = int(batch.pop("n_valid", len(batch["y"])))
        inds = np.asarray(batch.pop("input_inds"))[:n_valid]
        clouds = np.asarray(batch.pop("cloud_index"))[:n_valid]
        sb = shard_batch(mesh, batch, pad_to_mesh=True)
        fetch.push(logits_step(state, sb), accumulate, inds, clouds, n_valid)
    fetch.flush()
    cm = ConfusionMatrix(num_classes=cfg.num_classes,
                         ignore_index=cfg.get("ignore_index"))
    for ci in range(len(sums)):
        seen = counts[ci] > 0
        sub_pred = np.argmax(sums[ci], -1)
        proj = ds.projections[ci]
        keep = seen[proj]
        cm.update(sub_pred[proj][keep], ds.clouds_labels[ci][keep])
        if cfg.get("visualize") and cfg.get("run_dir"):
            # per-area input/gt/pred OBJ dumps
            # (parity: examples/segmentation/main.py:481-505)
            import os
            from ..datasets.vis3d import write_obj
            vis_dir = os.path.join(cfg.run_dir, "visualization")
            os.makedirs(vis_dir, exist_ok=True)
            cmap = getattr(ds, "cmap", None)
            coord = ds.clouds_points[ci]
            rgb = ds.clouds_colors[ci].astype(np.float32)
            rgb = rgb / 255.0 if rgb.max() > 1 else rgb
            write_obj(coord, rgb, os.path.join(vis_dir, f"input-{ci}.obj"))
            if cmap is not None:
                gt = cmap[ds.clouds_labels[ci]] / 255.0
                pred = cmap[sub_pred[proj]] / 255.0
                write_obj(coord, gt, os.path.join(vis_dir, f"gt-{ci}.obj"))
                write_obj(coord, pred,
                          os.path.join(vis_dir, f"pred-{ci}.obj"))
    miou, macc, oa, ious, accs = get_mious(cm.tp, cm.union, cm.count)
    return miou, macc, oa, ious, accs


def main_6fold(cfg):
    """S3DIS 6-fold cross-validated test (parity:
    examples/segmentation/test_s3dis_6fold.py:23-45): evaluate one
    pretrained checkpoint per held-out area, accumulate a global confusion
    matrix, and report per-area + overall metrics. ``pretrained_path`` is a
    format string with ``{area}`` (e.g. .../area{area}_best.msgpack)."""
    mesh = get_mesh()
    model = build_model_from_cfg(cfg.model)
    criterion = build_criterion_from_cfg(cfg.criterion_args)
    total = ConfusionMatrix(num_classes=cfg.num_classes,
                            ignore_index=cfg.get("ignore_index"))
    results = {}
    for area in range(1, 7):
        cfg.dataset.common.test_area = area
        val_loader = build_dataloader_from_cfg(
            cfg.get("val_batch_size", cfg.batch_size), cfg.dataset,
            cfg.dataloader, datatransforms_cfg=cfg.datatransforms,
            split="val", seed=cfg.get("seed") or 0)
        example = next(iter(val_loader))
        pos = jnp.asarray(example["pos"][:2])
        x = _features({k: jnp.asarray(v[:2]) for k, v in example.items()
                       if k != "n_valid"}, cfg)
        variables = jax.jit(model.init, static_argnames=("training",))(
            jax.random.PRNGKey(0), pos, x, training=False)
        tx = build_optimizer_from_cfg(variables["params"], lr=cfg.lr,
                                      **dict(cfg.optimizer))
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats",
                                                     FrozenDict()),
                           opt_state=tx.init(variables["params"]),
                           step=jnp.zeros((), jnp.int32))
        path = cfg.pretrained_path.format(area=area)
        payload, e, _ = load_checkpoint(_state_payload(state), path)
        state = _restore_state(state, payload)
        _, eval_step = make_seg_steps(model, tx, criterion, cfg)
        cm = ConfusionMatrix(num_classes=cfg.num_classes,
                             ignore_index=cfg.get("ignore_index"))
        for batch in val_loader:
            n_valid = int(batch.pop("n_valid", len(batch["y"])))
            preds = np.asarray(eval_step(
                state, shard_batch(mesh, batch, pad_to_mesh=True)))
            cm.update(preds[:n_valid], np.asarray(batch["y"])[:n_valid])
        total.value = total.value + cm.value
        miou, macc, oa, ious, _ = get_mious(cm.tp, cm.union, cm.count)
        logging.info("Area %d: miou %.2f macc %.2f oa %.2f",
                     area, miou, macc, oa)
        results[area] = {"miou": miou, "macc": macc, "oa": oa}
    miou, macc, oa, ious, _ = get_mious(total.tp, total.union, total.count)
    logging.info("6-fold overall: miou %.2f macc %.2f oa %.2f ious %s",
                 miou, macc, oa, np.round(ious, 2))
    results["overall"] = {"miou": miou, "macc": macc, "oa": oa}
    return results


def main(cfg):
    if cfg.get("mode") == "test_6fold":
        return main_6fold(cfg)
    seed = cfg.get("seed") or 0
    rng = set_random_seed(seed)
    mesh = get_mesh()

    model = build_model_from_cfg(cfg.model)
    if cfg.model.get("in_channels", None) is None:
        cfg.model.in_channels = cfg.model.encoder_args.in_channels

    val_loader = build_dataloader_from_cfg(
        cfg.get("val_batch_size", cfg.batch_size), cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="val", seed=seed)
    train_loader = build_dataloader_from_cfg(
        cfg.batch_size, cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="train", seed=seed)

    weights = None
    if cfg.get("cls_weighed_loss", False) and hasattr(val_loader.dataset,
                                                      "num_per_class"):
        weights = get_class_weights(val_loader.dataset.num_per_class,
                                    normalize=True)
    criterion = build_criterion_from_cfg(cfg.criterion_args)
    if weights is not None:
        criterion.weight = jnp.asarray(weights)

    example = next(iter(val_loader))
    rng, init_rng = jax.random.split(rng)
    pos = jnp.asarray(example["pos"][:2])
    x = _features({k: jnp.asarray(v[:2]) for k, v in example.items()
                   if k != "n_valid"}, cfg)
    variables = jax.jit(model.init, static_argnames=("training",))(
        init_rng, pos, x, training=False)
    params = variables["params"]
    tx = build_optimizer_from_cfg(params, lr=cfg.lr,
                                  grad_norm_clip=cfg.get("grad_norm_clip"),
                                  **dict(cfg.optimizer))
    state = TrainState(params=params,
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    lr_fn = build_scheduler_from_cfg(cfg)
    train_step, eval_step = make_seg_steps(model, tx, criterion, cfg)

    sphere = "sphere" in cfg.dataset.common.NAME.lower()
    if sphere:
        logits_step = make_sphere_logits_step(model, cfg)

        def _validate(st):
            return validate_sphere(logits_step, st, val_loader, mesh, cfg)
    else:
        def _validate(st):
            return validate_seg(eval_step, st, val_loader, mesh, cfg)

    if cfg.get("pretrained_path") and cfg.get("mode") in ("test", "val"):
        payload, e, _ = load_checkpoint(_state_payload(state),
                                        cfg.pretrained_path)
        state = _restore_state(state, payload)
        miou, macc, oa, ious, _ = _validate(state)
        logging.info("test: miou %.2f macc %.2f oa %.2f", miou, macc, oa)
        return miou

    # mode=resume continues in place (reference resume_checkpoint
    # semantics: restore model+opt state, start at epoch+1, keep best)
    resumed_best = 0.0
    if cfg.get("pretrained_path") and cfg.get("mode") == "resume":
        payload, epoch_loaded, resumed_best = load_checkpoint(
            _state_payload(state), cfg.pretrained_path)
        state = _restore_state(state, payload)
        cfg.start_epoch = epoch_loaded + 1
        logging.info("resumed from %s at epoch %d (best %.3f)",
                     cfg.pretrained_path, epoch_loaded, resumed_best)

    summary = Summary(cfg.get("run_dir"))
    best_miou = float(resumed_best or 0.0)
    for epoch in range(cfg.get("start_epoch", 1), cfg.epochs + 1):
        train_loader.set_epoch(epoch)
        lr = jnp.asarray(lr_fn(epoch - 1), jnp.float32)
        loss_meter = AverageMeter()
        fetch = PipelinedFetcher()
        for batch in train_loader:
            rng, sub = jax.random.split(rng)
            sb = shard_batch(mesh, batch)
            state, loss, _ = train_step(state, sb, sub, lr)
            fetch.push(loss, lambda l: loss_meter.update(float(l)))
        fetch.flush()
        miou = macc = oa = 0.0
        is_best = False
        if epoch % cfg.val_freq == 0:
            miou, macc, oa, ious, _ = _validate(state)
            is_best = miou > best_miou
            if is_best:
                best_miou = miou
        logging.info("Epoch %d loss %.4f miou %.2f oa %.2f best %.2f",
                     epoch, loss_meter.avg, miou, oa, best_miou)
        summary.add_scalar("train_loss", loss_meter.avg, epoch)
        summary.add_scalar("val_miou", miou, epoch)
        if cfg.get("run_name"):
            save_checkpoint(cfg, _state_payload(state), epoch, is_best=is_best,
                            additional={"best_val": best_miou})
    summary.close()
    return best_miou
