"""Classification training engine (baseline `mode: train` path).

Functional re-design of the reference trainer
(examples/classification/train.py:52-319 and the shared train_one_epoch /
validate in train_autoaug.py:463-548): a single jit'd train step over a
data-parallel mesh does FPS point-budget resampling, forward (mutable BN
batch stats = global-batch SyncBN under sharding), SmoothCE loss, global-norm
clip, and the optax update. The epoch loop, LR schedule stepping, confusion
matrix, checkpointing and corruption-eval cadence mirror the reference.
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..loss import build_criterion_from_cfg
from ..metricslog import Summary
from ..models import build_model_from_cfg
from ..ops import furthest_point_sample, gather_rows, index_points
from ..optim import build_optimizer_from_cfg
from ..parallel import get_mesh, shard_batch, replicate
from ..scheduler import build_scheduler_from_cfg
from ..utils import (AverageMeter, ConfusionMatrix, PipelinedFetcher,
                     save_checkpoint)

__all__ = ["TrainState", "build_train_tools", "train_one_epoch", "validate",
           "resample_points", "set_lr", "init_state", "make_train_step",
           "make_train_step_scan",
           "make_eval_step"]


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def set_lr(opt_state, lr):
    """Update the injected learning_rate hyperparam inside an optax state."""
    return optax.tree_utils.tree_set(opt_state, learning_rate=lr)


def resample_points(rng, points: jnp.ndarray, npoints: int) -> jnp.ndarray:
    """Train-time point-budget resampling (parity: train_autoaug.py:481-498):
    FPS to an intermediate budget then a batch-shared random subset.

    points: (B, N, C) with xyz in [..., :3].
    """
    num_curr = points.shape[1]
    if num_curr <= npoints:
        return points
    point_all = {1024: 1200, 4096: 4800, 8192: 8192}.get(npoints, npoints)
    point_all = min(point_all, num_curr)
    idx = furthest_point_sample(points[..., :3], point_all)  # (B, point_all)
    cols = jax.random.choice(rng, point_all, (npoints,), replace=False)
    idx = idx[:, cols]
    return gather_rows(points, idx)


def build_train_tools(cfg, model, params_like=None):
    """Build criterion, optimizer tx, lr schedule."""
    criterion = build_criterion_from_cfg(cfg.criterion_args)
    tx = build_optimizer_from_cfg(
        params_like, lr=cfg.lr, grad_norm_clip=cfg.get("grad_norm_clip"),
        **dict(cfg.optimizer))
    lr_fn = build_scheduler_from_cfg(cfg)
    return criterion, tx, lr_fn


def _make_train_step_traced(model, tx, criterion, cfg):
    npoints = int(cfg.num_points)
    in_channels = int(cfg.model.get("in_channels", None)
                      or cfg.model.encoder_args.in_channels)
    # adahessian needs the Hutchinson Hessian-diagonal probe each step
    # (parity: openpoints/optim/adahessian.py:76-101 set_hessian)
    second_order = str(cfg.get("optimizer", {}).get(
        "NAME", "")).lower() == "adahessian"
    # optional bf16 mixed-precision training (cfg.cls_precision: bf16) —
    # params/optimizer/BN-stats/loss stay f32, matmul compute and activation
    # storage drop to bf16 (standard TPU training practice; the framework
    # default stays exact f32 to match the reference numerics)
    from ..utils.precision import dtype_override
    cls_dtype = ("bfloat16"
                 if str(cfg.get("cls_precision", "f32")).lower()
                 in ("bf16", "bfloat16") else None)
    # ADAPTPOINT_TPU_TRAIN_FUSED=1 lowers the training forward's SA stages
    # through the fused train-BN kernel family (ops/pallas/satrainbn.py) —
    # same f32 numerics class as the unfused path (see module docstring),
    # grouped tensors never touch HBM in either direction
    from ..utils.fastpath import fused_train_bn, fused_trainbn_env
    trainbn = fused_trainbn_env()

    def train_step_traced(state: TrainState, batch, rng, lr):
        rng_fps, rng_drop, rng_hess = jax.random.split(rng, 3)
        points = batch["x"]  # (B, N, C) channels-last
        points = resample_points(rng_fps, points, npoints)
        pos = points[..., :3]
        x = points[..., :in_channels]
        y = batch["y"]

        def loss_fn(params):
            with dtype_override(cls_dtype), fused_train_bn(trainbn):
                logits, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    pos, x, training=True,
                    rngs={"dropout": rng_drop},
                    mutable=["batch_stats"])
            logits = logits.astype(jnp.float32)
            return criterion(logits, y), (logits, updates["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = set_lr(state.opt_state, lr)
        if second_order:
            from ..optim.adahessian import hutchinson_hess_diag
            gfn = lambda p: jax.grad(loss_fn, has_aux=True)(p)[0]  # noqa: E731
            hess = hutchinson_hess_diag(gfn, state.params, rng_hess)
            updates, opt_state = tx.update(grads, opt_state, state.params,
                                           hess_diag=hess)
        else:
            updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_bs,
                                  opt_state=opt_state, step=state.step + 1)
        preds = jnp.argmax(logits, axis=-1)
        return new_state, loss, preds

    return train_step_traced


def make_train_step(model, tx, criterion, cfg):
    return jax.jit(_make_train_step_traced(model, tx, criterion, cfg))


def make_train_step_scan(model, tx, criterion, cfg):
    """Multi-batch train step: ONE dispatch runs ``lax.scan`` over K stacked
    batches ({"x": (K,B,N,C), "y": (K,B)}).

    TPU-idiomatic executor: per-call host dispatch through a remote runtime
    costs ~10-20 ms, an order of magnitude more than the classifier's
    ~5 ms device step at the AdaptPoint protocol — scanning K batches per
    dispatch amortizes it to 1/K. Semantics: identical to K sequential
    ``train_step`` calls where step i uses ``jax.random.fold_in(rng, i)``
    (tested vs the sequential loop). Returns (state, losses (K,),
    preds (K,B))."""
    step = _make_train_step_traced(model, tx, criterion, cfg)

    @jax.jit
    def train_step_scan(state: TrainState, batches, rng, lr):
        def body(carry, xs):
            st, i = carry
            st2, loss, preds = step(st, xs, jax.random.fold_in(rng, i), lr)
            return (st2, i + 1), (loss, preds)

        (state, _), (losses, preds) = jax.lax.scan(
            body, (state, jnp.int32(0)), batches)
        return state, losses, preds

    return train_step_scan


def make_eval_step(model, cfg):
    npoints = int(cfg.num_points)
    in_channels = int(cfg.model.get("in_channels", None)
                      or cfg.model.encoder_args.in_channels)

    @jax.jit
    def eval_step(state: TrainState, batch):
        from ..utils.fastpath import fused_eval, fused_eval_env
        points = batch["x"][:, :npoints]
        pos = points[..., :3]
        x = points[..., :in_channels]
        with fused_eval(fused_eval_env()):
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                pos, x, training=False)
        return jnp.argmax(logits, axis=-1)

    return eval_step


def make_vote_eval_step(model, cfg, num_votes: int = 10):
    """Voting eval: average logits over random rotations of the cloud
    (parity: the reference's use_voting + 'vote' transforms,
    cfgs/scanobjectnn/default.yaml vote: [PointCloudRotation])."""
    npoints = int(cfg.num_points)
    in_channels = int(cfg.model.get("in_channels", None)
                      or cfg.model.encoder_args.in_channels)

    @jax.jit
    def vote_step(state: TrainState, batch, rng):
        points = batch["x"][:, :npoints]

        def one_vote(key):
            theta = jax.random.uniform(key, (), minval=-jnp.pi, maxval=jnp.pi)
            c, s = jnp.cos(theta), jnp.sin(theta)
            rot = jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], points.dtype)
            pos = points[..., :3] @ rot.T
            x = jnp.concatenate([pos, points[..., 3:in_channels]], -1)
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                pos, x, training=False)

        keys = jax.random.split(rng, num_votes)
        logits = jnp.mean(jax.vmap(one_vote)(keys), axis=0)
        return jnp.argmax(logits, axis=-1)

    return vote_step


def init_state(cfg, model, tx, rng, example_batch) -> TrainState:
    pos = jnp.asarray(example_batch["x"][:2, :, :3])
    in_channels = int(cfg.model.get("in_channels", None)
                      or cfg.model.encoder_args.in_channels)
    x = jnp.asarray(example_batch["x"][:2, :, :in_channels])
    variables = jax.jit(model.init, static_argnames=("training",))(
        rng, pos, x, training=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    opt_state = tx.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def train_one_epoch(train_step, state, loader, mesh, rng, lr, cfg, cm=None,
                    train_step_scan=None):
    """One epoch over the loader (parity: train_autoaug.py:463-523).

    With ``cfg.scan_batches: K > 1`` and a ``train_step_scan``
    (make_train_step_scan), groups of K same-shape batches run as ONE
    lax.scan dispatch — per-call host dispatch through a remote TPU
    runtime costs ~10-20 ms, which dominates small per-batch device
    steps; the ragged tail falls back to single steps."""
    loss_meter = AverageMeter()
    cm = cm or ConfusionMatrix(num_classes=cfg.num_classes)
    lr = jnp.asarray(lr, jnp.float32)
    scan_k = int(cfg.get("scan_batches", 1) or 1) \
        if train_step_scan is not None else 1

    fetch = PipelinedFetcher()

    def record(fetched, y_host):
        loss, preds = fetched
        cm.update(preds, y_host)
        loss_meter.update(float(loss))

    def run_single(state, batch, sub):
        sb = shard_batch(mesh, batch)
        state, loss, preds = train_step(state, sb, sub, lr)
        fetch.push((loss, preds), record, batch["y"])
        return state

    if scan_k <= 1:
        for batch in loader:
            rng, sub = jax.random.split(rng)
            state = run_single(state, batch, sub)
        fetch.flush()
        macc, oa, accs = cm.all_acc()
        return state, loss_meter.avg, macc, oa, accs, cm

    from ..parallel import shard_batch_stack
    buf = []

    def record_scan(fetched, y_host, k):
        losses, preds = fetched
        for j in range(k):
            cm.update(preds[j], y_host[j])
        for v in losses:
            loss_meter.update(float(v))

    def flush(state, rng):
        if not buf:
            return state, rng
        rng, sub = jax.random.split(rng)
        if len(buf) == scan_k:
            stacked = shard_batch_stack(mesh, buf)
            y_host = np.stack([b["y"] for b in buf])
            state, losses, preds = train_step_scan(state, stacked, sub, lr)
            fetch.push((losses, preds), record_scan, y_host, len(buf))
        else:  # ragged tail: single steps with per-batch folded rngs
            for j, b in enumerate(buf):
                state = run_single(state, b, jax.random.fold_in(sub, j))
        buf.clear()
        return state, rng

    first_shape = None
    for batch in loader:
        shp = tuple(np.asarray(batch["x"]).shape)
        if first_shape is None:
            first_shape = shp
        if shp != first_shape:  # buf can never hold scan_k here: it is
            state, rng = flush(state, rng)  # flushed right after append
            first_shape = shp
        buf.append(batch)
        if len(buf) == scan_k:
            state, rng = flush(state, rng)
            first_shape = None
    state, rng = flush(state, rng)
    fetch.flush()
    macc, oa, accs = cm.all_acc()
    return state, loss_meter.avg, macc, oa, accs, cm


def validate(eval_step, state, loader, mesh, cfg):
    """Full eval pass (parity: train_autoaug.py:527-548 validate).

    Padded final batches are trimmed with n_valid; under a sharded mesh the
    confusion counts are already global (single program output)."""
    cm = ConfusionMatrix(num_classes=cfg.num_classes)
    fetch = PipelinedFetcher()

    def record(preds, y_host, n_valid):
        cm.update(preds[:n_valid], y_host)

    for batch in loader:
        n_valid = int(batch.pop("n_valid", len(batch["y"])))
        y_host = batch["y"][:n_valid]
        sb = shard_batch(mesh, batch, pad_to_mesh=True)
        fetch.push(eval_step(state, sb), record, y_host, n_valid)
    fetch.flush()
    macc, oa, accs = cm.all_acc()
    return macc, oa, accs, cm
