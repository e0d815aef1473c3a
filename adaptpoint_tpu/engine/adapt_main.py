"""AdaptPoint experiment driver (``mode: adaptpoint`` / ``adaptpoint_modelnet``).

Parity with the reference (examples/classification/train_autoaug.py:242-461):
per epoch — (A) train G/D over the full train loader with the frozen
classifier providing feedback, buffering the generated fake clouds; (B) train
the classifier one epoch on the fake buffer; every 10 epochs run the
ScanObjectNN-C corruption sweep; validate per val_freq; checkpoint
latest/best + the GAN pair; final test of last and best + corruption sweeps.
"""
from __future__ import annotations

import logging
import os

import jax
import numpy as np

from ..datasets import (NumpyLoader, build_dataloader_from_cfg,
                        eval_corrupt_wrapper)
from ..datasets.scanobjectnn import ScanObjectNNC
from ..metricslog import Summary
from ..models import build_model_from_cfg
from ..parallel import get_mesh
from ..transforms import build_transforms_from_cfg
from ..utils import (PipelinedFetcher, load_checkpoint, save_checkpoint,
                     set_random_seed)
from ..utils.ckpt import save_pytree
from ..adapt.feedback import update_hardratio
from .adapt_trainer import build_gan, make_gan_step, train_gan_epoch
from .cls_main import _restore_state, _state_payload, print_cls_results
from .cls_trainer import (build_train_tools, init_state, make_eval_step,
                          make_train_step, train_one_epoch, validate)

__all__ = ["main", "validate_scanobjectnnc"]


def validate_scanobjectnnc(split, eval_step, state, mesh, cfg):
    """Corruption-split eval pass (parity: train_autoaug.py:550-574)."""
    transform = build_transforms_from_cfg(
        "val", cfg.get("datatransforms_scanobjectnn_c"))
    data_dir = cfg.get("scanobjectnn_c_dir", "./data/ScanObjectNN_C/scanobjectnn_c")
    ds = ScanObjectNNC(data_dir=data_dir, split=split, transform=transform)
    loader = NumpyLoader(ds, cfg.get("val_batch_size", cfg.batch_size))
    macc, oa, accs, cm = validate(eval_step, state, loader, mesh, cfg)
    return {"acc": oa / 100.0}


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
    test_loader = val_loader
    if hasattr(val_loader.dataset, "classes"):
        cfg.classes = list(val_loader.dataset.classes)

    example = next(iter(val_loader))
    rng, init_rng, gan_rng = jax.random.split(rng, 3)
    criterion, tx, lr_fn = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, init_rng, example)
    criterion, tx, lr_fn = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    train_step = make_train_step(model, tx, criterion, cfg)
    eval_step = make_eval_step(model, cfg)
    train_step_scan = None
    if int(cfg.get("scan_batches", 1) or 1) > 1:
        from .cls_trainer import make_train_step_scan
        train_step_scan = make_train_step_scan(model, tx, criterion, cfg)

    mode = cfg.get("mode", "adaptpoint")
    if cfg.get("pretrained_path") and mode in ("test", "val"):
        payload, epoch_loaded, _ = load_checkpoint(
            _state_payload(state), cfg.pretrained_path)
        state = _restore_state(state, payload)
        macc, oa, accs, _ = validate(eval_step, state, test_loader, mesh, cfg)
        print_cls_results(oa, macc, accs, epoch_loaded, cfg)
        return oa

    # resume the GAN loop (reference resume_checkpoint semantics,
    # train_autoaug_modelnet.py:323-327: restore model+optimizer, continue
    # at epoch+1; mode stays adaptpoint* here, opt in with resume=True)
    resume = bool(cfg.get("resume")) and bool(cfg.get("pretrained_path"))
    resumed_best = 0.0
    if resume:
        payload, epoch_loaded, resumed_best = load_checkpoint(
            _state_payload(state), cfg.pretrained_path)
        state = _restore_state(state, payload)
        from ..utils.ckpt import maybe_splice_opt_moments
        state = state.replace(opt_state=maybe_splice_opt_moments(
            state.opt_state, cfg.pretrained_path))
        cfg.start_epoch = epoch_loaded + 1
        logging.info("resumed classifier from %s at epoch %d (best %.3f)",
                     cfg.pretrained_path, epoch_loaded, resumed_best)

    train_loader = build_dataloader_from_cfg(
        cfg.batch_size, cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="train", seed=seed)

    example_cloud = jax.numpy.asarray(example["x"][:2, :, :3])
    generator, discriminator, tx_g, tx_d, gan_state = build_gan(
        cfg, example_cloud, gan_rng)
    gan_step = make_gan_step(generator, discriminator, tx_g, tx_d, model, cfg)
    if resume and cfg.get("run_dir"):
        gan_path = os.path.join(cfg.run_dir, "model_gan.msgpack")
        if os.path.exists(gan_path):
            # G/D params + batch stats only (Adam moments restart — the
            # per-epoch dump predates resume and stores no opt state)
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
    # modelnet variant: phase B runs RSMix over the FAKE loader when
    # rsmix_params is set (train_autoaug_modelnet.py:396-398); rsmix's
    # host-side mixing isn't expressible inside the fused on-device step
    use_rsmix = cfg.get("rsmix_params") is not None
    train_step_mixed = None
    if use_rsmix:
        from .corrupt_main import make_train_step_mixed
        train_step_mixed = make_train_step_mixed(model, tx, criterion, cfg)
    fused = bool(cfg.get("adaptpoint_fused", False)) and not use_rsmix
    if fused:
        from .adapt_trainer import make_fused_adapt_step
        fused_step = make_fused_adapt_step(generator, discriminator, tx_g,
                                           tx_d, model, tx, criterion, cfg)

    summary = Summary(cfg.get("run_dir"))
    params_cfg = cfg.adaptpoint_params
    best_val, macc_when_best, best_epoch = float(resumed_best or 0.0), 0.0, 0
    val_oa = val_macc = 0.0
    adjust_epoch = cfg.get("adaptpoint_adjustepoch", 0)

    for epoch in range(cfg.get("start_epoch", 1), cfg.epochs + 1):
        train_loader.set_epoch(epoch)
        lr = lr_fn(epoch - 1)
        rng, gan_erng, cls_erng = jax.random.split(rng, 3)

        if epoch > adjust_epoch and fused:
            # fused on-device variant: both phases in one jit step per batch
            from ..utils import AverageMeter, ConfusionMatrix
            from ..parallel import shard_batch
            import numpy as np
            hardratio = update_hardratio(params_cfg.hardratio_s,
                                         params_cfg.hardratio, epoch,
                                         cfg.epochs)
            hr = jax.numpy.asarray(hardratio, jax.numpy.float32)
            lr_dev = jax.numpy.asarray(lr, jax.numpy.float32)
            loss_meter = AverageMeter()
            cm = ConfusionMatrix(num_classes=cfg.num_classes)
            fetch = PipelinedFetcher()

            def record(fetched, y_host):
                preds, cls_loss = fetched
                cm.update(preds, y_host)
                loss_meter.update(float(cls_loss))

            for batch in train_loader:
                rng, sub = jax.random.split(rng)
                sb = shard_batch(mesh, batch)
                gan_state, state, preds, metrics = fused_step(
                    gan_state, state, sb, sub, hr, lr_dev)
                fetch.push((preds, metrics["cls_loss"]), record, batch["y"])
            fetch.flush()
            train_loss = loss_meter.avg
            train_macc, train_oa, _ = cm.all_acc()
        elif epoch > adjust_epoch:
            # PHASE A: adversarial augmentor training on the real loader
            hardratio = update_hardratio(params_cfg.hardratio_s,
                                         params_cfg.hardratio, epoch, cfg.epochs)
            gan_state, fake_dataset, gan_metrics = train_gan_epoch(
                gan_step, gan_state, state, train_loader, mesh, gan_erng,
                hardratio, cfg, summary, epoch=epoch)
            if cfg.get("run_dir"):
                save_pytree({"generator": {"params": gan_state.g_params,
                                           "batch_stats": gan_state.g_bs},
                             "discriminator": {"params": gan_state.d_params,
                                               "batch_stats": gan_state.d_bs}},
                            os.path.join(cfg.run_dir, "model_gan.msgpack"))
            # PHASE B: classifier epoch on the fake buffer
            fake_loader = NumpyLoader(fake_dataset, cfg.batch_size,
                                      shuffle=True, drop_last=True,
                                      seed=seed + epoch)
            if train_step_mixed is not None:
                from .corrupt_main import train_one_epoch_rsmix
                state, train_loss, train_macc, train_oa, _, _ = \
                    train_one_epoch_rsmix(train_step_mixed, state,
                                          fake_loader, mesh, cls_erng, lr,
                                          cfg)
            else:
                state, train_loss, train_macc, train_oa, _, _ = \
                    train_one_epoch(train_step, state, fake_loader, mesh,
                                    cls_erng, lr, cfg,
                                    train_step_scan=train_step_scan)
        else:
            state, train_loss, train_macc, train_oa, _, _ = train_one_epoch(
                train_step, state, train_loader, mesh, cls_erng, lr, cfg,
                train_step_scan=train_step_scan)

        # sweep cadence: every 10 epochs (train_autoaug.py:401); the
        # modelnet variant sweeps every 20 (train_autoaug_modelnet.py:412)
        sweep_every = 20 if mode == "adaptpoint_modelnet" else 10
        if (epoch + 1) % sweep_every == 0:
            _corruption_eval(cfg, eval_step, state, mesh, epoch)

        is_best = False
        if epoch % cfg.val_freq == 0:
            val_macc, val_oa, val_accs, _ = validate(
                eval_step, state, val_loader, mesh, cfg)
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

    # final tests on BOTH latest and best states (train_autoaug.py:437-456:
    # the reference runs test + the corruption sweep for each)
    test_macc, test_oa, test_accs, _ = validate(eval_step, state, test_loader,
                                                mesh, cfg)
    print_cls_results(test_oa, test_macc, test_accs, best_epoch, cfg)
    _corruption_eval(cfg, eval_step, state, mesh, "final_latest")
    if cfg.get("run_name"):
        best_path = os.path.join(cfg.ckpt_dir, f"{cfg.run_name}_ckpt_best.msgpack")
        if os.path.exists(best_path):
            payload, e, _ = load_checkpoint(_state_payload(state), best_path)
            state = _restore_state(state, payload)
            test_macc, test_oa, test_accs, _ = validate(
                eval_step, state, test_loader, mesh, cfg)
            print_cls_results(test_oa, test_macc, test_accs, e, cfg)
            # only sweep under the final_best tag when the best state was
            # actually restored — otherwise this re-sweeps the latest
            # state mislabeled as best
            _corruption_eval(cfg, eval_step, state, mesh, "final_best")
    summary.close()
    return best_val


def _corruption_eval(cfg, eval_step, state, mesh, epoch):
    """ScanObjectNN-C sweep, or ModelNet-C in adaptpoint_modelnet mode
    (parity: train_autoaug.py:401-402 vs train_autoaug_modelnet.py)."""
    eval_args = {"eval_step": eval_step, "state": state, "mesh": mesh,
                 "cfg": cfg}
    try:
        if cfg.get("mode") == "adaptpoint_modelnet":
            from ..datasets.modelnet import eval_corrupt_wrapper_modelnetc
            eval_corrupt_wrapper_modelnetc(eval_args, cfg.get("run_dir"), epoch)
        else:
            eval_corrupt_wrapper(validate_scanobjectnnc, eval_args,
                                 cfg.get("run_dir"), epoch)
    except FileNotFoundError as e:
        logging.warning("skipping corruption eval: %s", e)
