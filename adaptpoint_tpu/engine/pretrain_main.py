"""MAE-style pretraining driver (``mode: pretrain``).

Parity: examples/classification/pretrain.py:19-150 — self-supervised
reconstruction of masked point clouds; checkpoints the encoder for later
finetuning (mode=finetune / finetune_encoder load the encoder subtree via the
tolerant partial restore).
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..datasets import build_dataloader_from_cfg
from ..metricslog import Summary
from ..models import build_model_from_cfg
from ..optim import build_optimizer_from_cfg
from ..parallel import get_mesh, shard_batch
from ..scheduler import build_scheduler_from_cfg
from ..utils import (AverageMeter, PipelinedFetcher, save_checkpoint,
                     set_random_seed)
from .cls_main import _state_payload
from .cls_trainer import TrainState, set_lr

__all__ = ["main"]


def main(cfg):
    seed = cfg.get("seed") or 0
    rng = set_random_seed(seed)
    mesh = get_mesh()

    model = build_model_from_cfg(cfg.model)
    train_loader = build_dataloader_from_cfg(
        cfg.batch_size, cfg.dataset, cfg.dataloader,
        datatransforms_cfg=cfg.datatransforms, split="train", seed=seed)

    example = next(iter(train_loader))
    rng, init_rng, mrng = jax.random.split(rng, 3)
    xyz = jnp.asarray(example["pos"][:2])
    variables = model.init({"params": init_rng, "masking": mrng}, xyz,
                           training=True)
    params = variables["params"]
    tx = build_optimizer_from_cfg(params, lr=cfg.lr,
                                  grad_norm_clip=cfg.get("grad_norm_clip"),
                                  **dict(cfg.optimizer))
    state = TrainState(params=params,
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    lr_fn = build_scheduler_from_cfg(cfg)

    @jax.jit
    def train_step(state, batch, rng, lr):
        def loss_fn(params):
            (loss, _), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pos"], training=True, rngs={"masking": rng},
                mutable=["batch_stats"])
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, batch_stats=new_bs,
                             opt_state=opt_state, step=state.step + 1), loss

    summary = Summary(cfg.get("run_dir"))
    for epoch in range(cfg.get("start_epoch", 1), cfg.epochs + 1):
        train_loader.set_epoch(epoch)
        lr = jnp.asarray(lr_fn(epoch - 1), jnp.float32)
        meter = AverageMeter()
        fetch = PipelinedFetcher()
        for batch in train_loader:
            rng, sub = jax.random.split(rng)
            sb = shard_batch(mesh, batch)
            state, loss = train_step(state, sb, sub, lr)
            fetch.push(loss, lambda l: meter.update(float(l)))
        fetch.flush()
        logging.info("Pretrain epoch %d loss %.4f", epoch, meter.avg)
        summary.add_scalar("pretrain_loss", meter.avg, epoch)
        if cfg.get("run_name"):
            save_checkpoint(cfg, _state_payload(state), epoch)
    summary.close()
    return meter.avg
