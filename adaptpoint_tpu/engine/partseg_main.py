"""ShapeNetPart part-segmentation training/eval + AdaptPoint variant.

Parity: examples/shapenetpart/main.py:100-360 (baseline train/eval with
ins/cls mIoU and optional kNN label refinement) and
examples/shapenetpart/train_adapt.py:119-278 (two-phase AdaptPoint epoch for
part seg: generator trained with adversarial loss only — no feedback term,
train_adapt.py:215 — buffering pos/y/heights/cls into Form_dataset_shapenet).
"""
from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..adapt import build_adaptpointmodels_from_cfg
from ..adapt.form_dataset import FormDatasetShapeNet
from ..datasets import NumpyLoader, build_dataloader_from_cfg
from ..datasets.shapenetpart import (CLS2PARTS, ShapeNetPartC,
                                     eval_corrupt_wrapper_shapenetc)
from ..loss import BCELoss, build_criterion_from_cfg
from ..metricslog import Summary
from ..models import build_model_from_cfg
from ..parallel import get_mesh, shard_batch
from ..utils import (AverageMeter, PipelinedFetcher, load_checkpoint,
                     save_checkpoint, set_random_seed)
from ..utils.ckpt import save_pytree
from ..utils.partseg import get_ins_mious, part_seg_refinement
from .adapt_trainer import GanState
from .cls_main import _restore_state, _state_payload
from .cls_trainer import TrainState, set_lr

__all__ = ["main"]

_bce = BCELoss()


def _in_channels(cfg) -> int:
    return int(cfg.model.get("in_channels", None)
               or cfg.model.encoder_args.in_channels)


def make_partseg_train_step(model, tx, criterion, cfg):
    in_channels = _in_channels(cfg)

    @jax.jit
    def train_step(state: TrainState, batch, rng, lr):
        pos = batch["pos"]
        x = batch["x"][..., :in_channels]
        y = batch["y"]  # (B, N) part labels
        cls0 = batch["cls"]

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pos, x, cls0, training=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
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


def make_partseg_eval_step(model, cfg):
    in_channels = _in_channels(cfg)

    @jax.jit
    def eval_step(state: TrainState, batch):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["pos"], batch["x"][..., :in_channels], batch["cls"],
            training=False)
        return jnp.argmax(logits, -1)

    return eval_step


def validate_partseg(eval_step, state, loader, mesh, cfg, refine: bool = False):
    """Instance/class mIoU eval (parity: examples/shapenetpart/main.py:252-330)."""
    cls2parts = CLS2PARTS
    num_classes = len(cls2parts)
    ins_mious_sum = np.zeros(num_classes)
    cls_counts = np.zeros(num_classes)
    correct = total = 0
    fetch = PipelinedFetcher()

    def record(preds, batch, n_valid):
        nonlocal correct, total
        preds = preds[:n_valid]
        y = np.asarray(batch["y"])[:n_valid]
        cls0 = np.asarray(batch["cls"]).reshape(-1)[:n_valid]
        if refine:
            preds = part_seg_refinement(preds, np.asarray(batch["pos"])[:n_valid],
                                        cls0, cls2parts)
        correct += (preds == y).sum()
        total += y.size
        mious = get_ins_mious(preds, y, cls0, cls2parts)
        for c, m in zip(cls0, mious):
            ins_mious_sum[int(c)] += m
            cls_counts[int(c)] += 1

    for batch in loader:
        n_valid = int(batch.pop("n_valid", len(batch["y"])))
        sb = shard_batch(mesh, batch, pad_to_mesh=True)
        fetch.push(eval_step(state, sb), record, batch, n_valid)
    fetch.flush()
    present = cls_counts > 0
    cls_mious = ins_mious_sum[present] / cls_counts[present]
    ins_miou = ins_mious_sum.sum() / max(cls_counts.sum(), 1)
    cls_miou = float(cls_mious.mean())
    acc = correct / max(total, 1)
    return {"acc": float(acc), "ins_miou": float(ins_miou),
            "cls_miou": cls_miou}


def make_partseg_gan_step(generator, discriminator, tx_g, tx_d, cfg):
    """G/D step for part-seg: adversarial loss only (train_adapt.py:215)."""

    @jax.jit
    def gan_step(state: GanState, batch, rng):
        input_pc = batch["pos"]
        r_wolf, r_gum, r_d1, r_d2, r_d3 = jax.random.split(rng, 5)

        def g_loss_fn(g_params):
            (_, gen), g_updates = generator.apply(
                {"params": g_params, "batch_stats": state.g_bs},
                input_pc, training=True,
                rngs={"wolf": r_wolf, "gumbel": r_gum},
                mutable=["batch_stats"])
            d_prob, d_updates = discriminator.apply(
                {"params": state.d_params, "batch_stats": state.d_bs},
                gen, training=True, rngs={"dropout": r_d1},
                mutable=["batch_stats"])
            g_loss = _bce(d_prob, jnp.full_like(d_prob, 0.9))
            return g_loss, (gen, g_updates["batch_stats"],
                            d_updates["batch_stats"])

        (g_loss, (gen, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_up, g_opt = tx_g.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_up)
        gen_d = jax.lax.stop_gradient(gen)

        def d_loss_fn(d_params):
            rp, u1 = discriminator.apply(
                {"params": d_params, "batch_stats": d_bs}, input_pc,
                training=True, rngs={"dropout": r_d2}, mutable=["batch_stats"])
            fp, u2 = discriminator.apply(
                {"params": d_params, "batch_stats": u1["batch_stats"]}, gen_d,
                training=True, rngs={"dropout": r_d3}, mutable=["batch_stats"])
            return ((_bce(rp, jnp.full_like(rp, 0.9)) +
                     _bce(fp, jnp.full_like(fp, 0.1))) / 2.0,
                    u2["batch_stats"])

        (d_loss, d_bs2), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params)
        d_up, d_opt = tx_d.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_up)
        new = state.replace(g_params=g_params, g_bs=g_bs, g_opt=g_opt,
                            d_params=d_params, d_bs=d_bs2, d_opt=d_opt,
                            step=state.step + 1)
        return new, gen, {"g_loss": g_loss, "d_loss": d_loss}

    return gan_step


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
    train_loader = build_dataloader_from_cfg(
        cfg.batch_size, cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="train", seed=seed)

    example = next(iter(val_loader))
    criterion = build_criterion_from_cfg(cfg.criterion_args)
    from ..optim import build_optimizer_from_cfg
    from ..scheduler import build_scheduler_from_cfg

    in_ch = _in_channels(cfg)
    rng, init_rng, gan_rng = jax.random.split(rng, 3)
    variables = model.init(init_rng, jnp.asarray(example["pos"][:2]),
                           jnp.asarray(example["x"][:2, :, :in_ch]),
                           jnp.asarray(example["cls"][:2]), training=False)
    from flax.core import FrozenDict
    params = variables["params"]
    tx = build_optimizer_from_cfg(params, lr=cfg.lr,
                                  grad_norm_clip=cfg.get("grad_norm_clip"),
                                  **dict(cfg.optimizer))
    state = TrainState(params=params,
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    lr_fn = build_scheduler_from_cfg(cfg)
    train_step = make_partseg_train_step(model, tx, criterion, cfg)
    eval_step = make_partseg_eval_step(model, cfg)

    mode = cfg.get("mode", "train")
    use_adapt = mode == "adaptpoint" or cfg.get("adaptmodel_gan") is not None

    def shapenetc_sweep(st, tag):
        """ShapeNet-C corruption sweep on state ``st`` (train_shapenetc.py
        behavior), appended to <run_dir>/outcorruption.txt under ``tag``."""
        def eval_c(split):
            from ..transforms import build_transforms_from_cfg
            transform = build_transforms_from_cfg(
                "val", cfg.get("datatransforms_shapenet_c"))
            ds = ShapeNetPartC(
                data_dir=cfg.get("shapenet_c_dir", "./data/shapenet_c"),
                split=split, transform=transform)
            loader = NumpyLoader(ds, cfg.get("val_batch_size", cfg.batch_size))
            return validate_partseg(eval_step, st, loader, mesh, cfg)

        try:
            eval_corrupt_wrapper_shapenetc(
                lambda split: eval_c(split), {}, cfg.get("run_dir"), tag)
        except FileNotFoundError as e:
            logging.warning("skipping shapenet-c eval: %s", e)

    if cfg.get("pretrained_path") and mode in ("test", "val"):
        payload, e, _ = load_checkpoint(_state_payload(state), cfg.pretrained_path)
        state = _restore_state(state, payload)
        perf = validate_partseg(eval_step, state, val_loader, mesh, cfg,
                                refine=cfg.get("refine", False))
        logging.info("test: %s", perf)
        if cfg.get("eval_shapenet_c", False):
            shapenetc_sweep(state, f"test-{os.path.basename(cfg.pretrained_path)}")
        return perf

    # resume (reference resume_checkpoint semantics for both part-seg
    # trainers: main.py:167-171, train_adapt.py:352-362) — mode=resume or
    # the adapt-loop resume=True flag
    resume = cfg.get("pretrained_path") and (mode == "resume"
                                             or cfg.get("resume"))
    resumed_best = 0.0
    if resume:
        payload, epoch_loaded, resumed_best = load_checkpoint(
            _state_payload(state), cfg.pretrained_path)
        state = _restore_state(state, payload)
        from ..utils.ckpt import maybe_splice_opt_moments
        state = state.replace(opt_state=maybe_splice_opt_moments(
            state.opt_state, cfg.pretrained_path))
        cfg.start_epoch = epoch_loaded + 1
        logging.info("resumed from %s at epoch %d (best_ins %.3f)",
                     cfg.pretrained_path, epoch_loaded, resumed_best)

    gan_state = gan_step = None
    if use_adapt:
        generator = build_adaptpointmodels_from_cfg(cfg.adaptmodel_gan)
        discriminator = build_adaptpointmodels_from_cfg(cfg.adaptmodel_dis)
        p = cfg.adaptpoint_params
        rg, rd, rw, rgum = jax.random.split(gan_rng, 4)
        cloud = jnp.asarray(example["pos"][:2])
        g_vars = generator.init({"params": rg, "wolf": rw, "gumbel": rgum},
                                cloud, training=False)
        d_vars = discriminator.init({"params": rd, "dropout": rd}, cloud,
                                    training=False)
        tx_g = optax.adam(p.lr_generator, b1=p.b1, b2=p.b2)
        tx_d = optax.adam(p.lr_discriminator, b1=p.b1, b2=p.b2)
        gan_state = GanState(
            g_params=g_vars["params"],
            g_bs=g_vars.get("batch_stats", FrozenDict()),
            g_opt=tx_g.init(g_vars["params"]),
            d_params=d_vars["params"],
            d_bs=d_vars.get("batch_stats", FrozenDict()),
            d_opt=tx_d.init(d_vars["params"]),
            step=jnp.zeros((), jnp.int32))
        gan_step = make_partseg_gan_step(generator, discriminator, tx_g, tx_d, cfg)
        if resume and cfg.get("run_dir"):
            gan_path = os.path.join(cfg.run_dir, "model_gan.msgpack")
            if os.path.exists(gan_path):
                # G/D params + batch stats (the per-epoch dump stores no
                # optimizer moments — Adam restarts, as in adapt_main)
                target = {"generator": {"params": gan_state.g_params,
                                        "batch_stats": gan_state.g_bs},
                          "discriminator": {"params": gan_state.d_params,
                                            "batch_stats": gan_state.d_bs}}
                merged, _, _ = load_checkpoint(target, gan_path)
                gan_state = gan_state.replace(
                    g_params=merged["generator"]["params"],
                    g_bs=merged["generator"]["batch_stats"],
                    d_params=merged["discriminator"]["params"],
                    d_bs=merged["discriminator"]["batch_stats"])
                logging.info("resumed GAN pair from %s", gan_path)

    summary = Summary(cfg.get("run_dir"))
    best_ins = float(resumed_best or 0.0)
    for epoch in range(cfg.get("start_epoch", 1), cfg.epochs + 1):
        train_loader.set_epoch(epoch)
        lr = lr_fn(epoch - 1)
        rng, erng, grng = jax.random.split(rng, 3)

        loader = train_loader
        if use_adapt:
            pos_buf, y_buf, h_buf, cls_buf = [], [], [], []
            gfetch = PipelinedFetcher()

            def collect(gen, batch):
                pos_buf.append(gen)
                y_buf.append(np.asarray(batch["y"]))
                h_buf.append(np.asarray(batch["x"])[..., 3:4])
                cls_buf.append(np.asarray(batch["cls"]))

            for batch in train_loader:
                grng, sub = jax.random.split(grng)
                sb = shard_batch(mesh, batch)
                gan_state, gen, gm = gan_step(gan_state, sb, sub)
                gfetch.push(gen, collect, batch)
            gfetch.flush()
            fake = FormDatasetShapeNet(pos_buf, y_buf, h_buf, cls_buf)
            loader = NumpyLoader(fake, cfg.batch_size, shuffle=True,
                                 drop_last=True, seed=seed + epoch)
            if cfg.get("run_dir"):
                save_pytree({"generator": {"params": gan_state.g_params,
                                           "batch_stats": gan_state.g_bs},
                             "discriminator": {"params": gan_state.d_params,
                                               "batch_stats": gan_state.d_bs}},
                            os.path.join(cfg.run_dir, "model_gan.msgpack"))

        loss_meter = AverageMeter()
        lr_dev = jnp.asarray(lr, jnp.float32)
        tfetch = PipelinedFetcher()
        for batch in loader:
            rng, sub = jax.random.split(rng)
            if "x" not in batch:  # fake loader serves pos/heights
                batch["x"] = np.concatenate(
                    [batch["pos"], batch["heights"]], axis=-1)
            batch.pop("heights", None)
            sb = shard_batch(mesh, batch)
            state, loss, preds = train_step(state, sb, sub, lr_dev)
            tfetch.push(loss, lambda l: loss_meter.update(float(l)))
        tfetch.flush()

        perf = {}
        if epoch % cfg.val_freq == 0:
            perf = validate_partseg(eval_step, state, val_loader, mesh, cfg)
            is_best = perf["ins_miou"] > best_ins
            if is_best:
                best_ins = perf["ins_miou"]
            if cfg.get("run_name"):
                save_checkpoint(cfg, _state_payload(state), epoch,
                                is_best=is_best,
                                additional={"best_val": best_ins})
        logging.info("Epoch %d LR %.6f loss %.4f val %s best_ins %.2f",
                     epoch, lr, loss_meter.avg, perf, best_ins)
        summary.add_scalar("train_loss", loss_meter.avg, epoch)
        if perf:
            summary.add_scalar("ins_miou", perf["ins_miou"], epoch)

    # optional ShapeNet-C sweep on BOTH latest and best states (reference
    # tests last + best ckpt then corruption-sweeps both,
    # train_autoaug.py:437-456 / train_shapenetc.py)
    if cfg.get("eval_shapenet_c", False):
        shapenetc_sweep(state, f"{cfg.epochs}-latest")
        if cfg.get("run_name"):
            best_path = os.path.join(
                cfg.ckpt_dir, f"{cfg.run_name}_ckpt_best.msgpack")
            if os.path.exists(best_path):
                payload, _, _ = load_checkpoint(
                    _state_payload(state), best_path)
                shapenetc_sweep(_restore_state(state, payload),
                                f"{cfg.epochs}-best")
    summary.close()
    return best_ins
