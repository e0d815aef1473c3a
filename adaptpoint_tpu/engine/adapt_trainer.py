"""AdaptPoint adversarial-augmentation training engine.

Functional re-design of the reference two-phase epoch
(examples/classification/train_autoaug.py:119-237 train_gan + :361-398 epoch
loop):

Phase A (``gan_step``, one jit'd program): with the task classifier frozen in
eval mode, the generator produces fake clouds; G is updated on
BCE(D(gen), 0.9) + perception-guidance feedback; D is updated on
(BCE(D(real), 0.9) + BCE(D(stop_grad(gen)), 0.1)) / 2 — all inside a single
sharded step, so generation never round-trips through the host (the reference
buffers to numpy + a fresh DataLoader; we keep the buffer semantics by
collecting gen outputs per batch, but generation + both updates stay fused
on-device).

Phase B trains the classifier on the epoch's fake buffer with the standard
train step (FPS 2048->1200->1024 resampling inside the step).
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..adapt import build_adaptpointmodels_from_cfg, feedback_loss
from ..adapt.form_dataset import FormDatasetCls
from ..loss import BCELoss, build_criterion_from_cfg
from ..parallel import shard_batch
from ..utils import AverageMeter, PipelinedFetcher

__all__ = ["GanState", "build_gan", "make_gan_step", "train_gan_epoch"]

_bce = BCELoss()


class GanState(struct.PyTreeNode):
    g_params: Any
    g_bs: Any
    g_opt: Any
    d_params: Any
    d_bs: Any
    d_opt: Any
    step: jnp.ndarray


def build_gan(cfg, example_cloud, rng):
    """Build G + D and their Adam optimizers
    (parity: train_autoaug.py:80-117 get_gan_model; Adam lr 1e-4 / 4e-4,
    betas (b1, b2))."""
    params_cfg = cfg.adaptpoint_params
    generator = build_adaptpointmodels_from_cfg(cfg.adaptmodel_gan)
    discriminator = build_adaptpointmodels_from_cfg(cfg.adaptmodel_dis)

    rg, rd, rw, rgum = jax.random.split(rng, 4)
    g_vars = jax.jit(generator.init, static_argnames=("training",))(
        {"params": rg, "wolf": rw, "gumbel": rgum}, example_cloud,
        training=False)
    d_vars = jax.jit(discriminator.init, static_argnames=("training",))(
        {"params": rd, "dropout": rd}, example_cloud, training=False)

    tx_g = optax.adam(params_cfg.lr_generator, b1=params_cfg.b1, b2=params_cfg.b2)
    tx_d = optax.adam(params_cfg.lr_discriminator, b1=params_cfg.b1,
                      b2=params_cfg.b2)
    state = GanState(
        g_params=g_vars["params"], g_bs=g_vars.get("batch_stats", FrozenDict()),
        g_opt=tx_g.init(g_vars["params"]),
        d_params=d_vars["params"], d_bs=d_vars.get("batch_stats", FrozenDict()),
        d_opt=tx_d.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32))
    return generator, discriminator, tx_g, tx_d, state


def make_gan_step(generator, discriminator, tx_g, tx_d, cls_model, cfg):
    """One fused G+D adversarial step (parity: train_autoaug.py:133-226).

    Precision: the whole adversarial step (controller convs/attention AND the
    frozen feedback classifier) runs under a bf16 compute policy by default
    (``cfg.gan_precision: f32`` restores full f32). Params, BN statistics,
    losses, gumbel sampling, transform math and ball/FPS selection stay f32 —
    only matmul compute and grouped-activation storage round to bf16, which
    is activation-grade noise on a GAN guidance signal while roughly halving
    the dominant MXU/HBM cost of phase A. Phase B (the real classifier
    update) is a separate trace and keeps exact f32.
    """
    from ..utils.precision import dtype_override

    criterion = build_criterion_from_cfg(cfg.criterion_args)
    feedback_ratio = float(cfg.get("feedbackloss_ratio", 1))
    in_channels = int(cfg.model.get("in_channels", None)
                      or cfg.model.encoder_args.in_channels)
    # platform-aware default: bf16 pays off on the MXU; CPU (tests, dryrun)
    # keeps exact f32 — bf16 there is emulated, slower AND less accurate
    default_prec = "bf16" if jax.default_backend() == "tpu" else "f32"
    gan_dtype = ("bfloat16"
                 if str(cfg.get("gan_precision", default_prec)).lower()
                 in ("bf16", "bfloat16") else None)

    def cls_forward(cls_state, pos, x):
        # frozen task model, eval mode (ganloss_cls.py:44-47); logits back to
        # f32 so the feedback CE/softmax is computed at full precision
        logits = cls_model.apply(
            {"params": cls_state.params, "batch_stats": cls_state.batch_stats},
            pos, x, training=False)
        return logits.astype(jnp.float32)

    def gan_step_traced(state: GanState, cls_state, batch, rng, hardratio):
        points = batch["x"]  # (B, N, C) channels-last, xyz in [..,:3]
        label = batch["y"]
        input_pc = points[..., :3]
        r_wolf, r_gum, r_d1, r_d2 = jax.random.split(rng, 4)

        # ONE sequential FPS of the raw cloud serves every consumer that
        # subsamples it this step (prefix property, ops.fps_prefix_idx):
        # the controller's anchors + grouper0 and the frozen-classifier
        # REAL pass's first SA all take prefixes. The fake pass runs on
        # the generated cloud and keeps its own FPS.
        from ..ops import furthest_point_sample
        from ..utils.fastpath import shared_first_fps
        fps_shared = furthest_point_sample(input_pc, input_pc.shape[1] // 2)

        def g_loss_fn(g_params):
            with shared_first_fps(fps_shared):
                (_, gen), g_updates = generator.apply(
                    {"params": g_params, "batch_stats": state.g_bs},
                    input_pc, training=True,
                    rngs={"wolf": r_wolf, "gumbel": r_gum},
                    mutable=["batch_stats"])
            d_prob, d_updates = discriminator.apply(
                {"params": state.d_params, "batch_stats": state.d_bs},
                gen, training=True, rngs={"dropout": r_d1},
                mutable=["batch_stats"])
            g_loss_raw = _bce(d_prob, jnp.full_like(d_prob, 0.9))

            # two SEPARATE classifier calls on purpose: the real pass is
            # outside the differentiated graph entirely (loss_real is a
            # constant w.r.t. g_params), so its backward costs nothing —
            # batching [fake || real] into one call was measured 9% SLOWER
            # at B=32 because the input-grad then traverses both halves.
            # The fake pass lowers through the custom-VJP fused SA stage
            # (fastpath.fused_train): same eval-mode forward, backward
            # recomputed in VMEM — the grouped (B,K,M,3+C) tensor never
            # exists in either direction.
            from ..utils.fastpath import frozen_params, fused_train
            fake_x = jnp.concatenate([gen, points[..., 3:in_channels]], -1)
            # frozen_params: the classifier is FROZEN here, so the fused SA
            # backward statically skips its weight-cotangent matmuls
            with fused_train(), frozen_params():
                logits_fake = cls_forward(cls_state, gen, fake_x)
            # real pass is gradient-free (stop_gradient): lower it through
            # the forward-only fused eval SA kernel (utils/fastpath.py) —
            # the fake pass above needs d(logits)/d(gen) and keeps the
            # differentiable path
            from ..utils.fastpath import fused_eval
            with fused_eval(), shared_first_fps(
                    jax.lax.stop_gradient(fps_shared)):
                logits_real = cls_forward(
                    cls_state, jax.lax.stop_gradient(input_pc),
                    jax.lax.stop_gradient(points[..., :in_channels]))
            loss_fake = criterion(logits_fake, label)
            loss_real = criterion(logits_real, label)
            fb = feedback_loss(loss_fake, loss_real, hardratio)
            g_loss = g_loss_raw + fb * feedback_ratio if feedback_ratio > 0 \
                else g_loss_raw
            aux = dict(gen=gen, g_bs=g_updates["batch_stats"],
                       d_bs=d_updates["batch_stats"], g_loss_raw=g_loss_raw,
                       feedback=fb, loss_fake=loss_fake, loss_real=loss_real)
            return g_loss, aux

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        g_up, g_opt = tx_g.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_up)

        gen_detached = jax.lax.stop_gradient(aux["gen"])

        def d_loss_fn(d_params):
            # ONE batched D pass over [real || fake] (reference runs two,
            # train_autoaug.py:167-171): the spectral-norm power-iteration
            # state is input-independent (it only reads the weights), the
            # dropout masks are per-row independent either way, and there
            # is no BatchNorm in D — so the batched pass computes the same
            # losses while amortizing the D launch/bwd structure. One
            # deliberate dynamics difference: the reference's two sequential
            # applies each advance u/v, so its SN estimate takes two power
            # iterations per d-step vs our one — the per-apply estimate is
            # identical, only the (already-converged) u/v trajectory warms
            # up at half rate.
            bsz = input_pc.shape[0]
            both = jnp.concatenate([input_pc, gen_detached], axis=0)
            prob, d_up = discriminator.apply(
                {"params": d_params, "batch_stats": aux["d_bs"]},
                both, training=True, rngs={"dropout": r_d2},
                mutable=["batch_stats"])
            real_prob, fake_prob = prob[:bsz], prob[bsz:]
            real_loss = _bce(real_prob, jnp.full_like(real_prob, 0.9))
            fake_loss = _bce(fake_prob, jnp.full_like(fake_prob, 0.1))
            return (real_loss + fake_loss) / 2.0, d_up["batch_stats"]

        (d_loss, d_bs), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params)
        d_up, d_opt = tx_d.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_up)

        new_state = state.replace(
            g_params=g_params, g_bs=aux["g_bs"], g_opt=g_opt,
            d_params=d_params, d_bs=d_bs, d_opt=d_opt, step=state.step + 1)
        metrics = {"g_loss": g_loss, "g_loss_raw": aux["g_loss_raw"],
                   "d_loss": d_loss, "feedback": aux["feedback"],
                   "loss_fake": aux["loss_fake"], "loss_real": aux["loss_real"]}
        return new_state, aux["gen"], metrics

    @jax.jit
    def gan_step(state: GanState, cls_state, batch, rng, hardratio):
        with dtype_override(gan_dtype):
            return gan_step_traced(state, cls_state, batch, rng, hardratio)

    return gan_step


def _dump_fake_batch(cfg, epoch, i, gen_host, raw_host, label_host):
    """Periodic fake-cloud h5 dumps (parity: train_autoaug.py:213-222)."""
    import os
    try:
        import h5py
    except ImportError:
        return
    path = os.path.join(cfg.run_dir, "fakedata", f"epoch{epoch}")
    os.makedirs(path, exist_ok=True)
    with h5py.File(os.path.join(path, f"minibatch{i}.h5"), "w") as f:
        f["pointcloud"] = gen_host
        f["raw"] = raw_host
        f["label"] = label_host


def make_fused_adapt_step(generator, discriminator, tx_g, tx_d, cls_model,
                          cls_tx, cls_criterion, cfg):
    """Single fused on-device step: G/D adversarial update + classifier
    update on the freshly generated clouds — no host round-trip of the fake
    buffer (the TPU-native alternative called out in SURVEY.md §3.2; enable
    with cfg.adaptpoint_fused=True; the reference's stale-epoch-buffer
    semantics remain the default)."""
    from .cls_trainer import resample_points, set_lr

    gan_step = make_gan_step(generator, discriminator, tx_g, tx_d, cls_model,
                             cfg)
    npoints = int(cfg.num_points)
    in_channels = int(cfg.model.get("in_channels", None)
                      or cfg.model.encoder_args.in_channels)

    @jax.jit
    def fused_step(gan_state: GanState, cls_state, batch, rng, hardratio, lr):
        r_gan, r_fps, r_drop = jax.random.split(rng, 3)
        gan_state, gen, metrics = gan_step(gan_state, cls_state, batch, r_gan,
                                           hardratio)
        points = jnp.concatenate(
            [jax.lax.stop_gradient(gen), batch["x"][..., 3:]], axis=-1)
        points = resample_points(r_fps, points, npoints)
        pos = points[..., :3]
        x = points[..., :in_channels]
        y = batch["y"]

        def loss_fn(params):
            logits, updates = cls_model.apply(
                {"params": params, "batch_stats": cls_state.batch_stats},
                pos, x, training=True, rngs={"dropout": r_drop},
                mutable=["batch_stats"])
            return cls_criterion(logits, y), (logits, updates["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(cls_state.params)
        opt_state = set_lr(cls_state.opt_state, lr)
        updates, opt_state = cls_tx.update(grads, opt_state, cls_state.params)
        params = optax.apply_updates(cls_state.params, updates)
        cls_state = cls_state.replace(params=params, batch_stats=new_bs,
                                      opt_state=opt_state,
                                      step=cls_state.step + 1)
        metrics = dict(metrics, cls_loss=loss)
        return gan_state, cls_state, jnp.argmax(logits, -1), metrics

    return fused_step


def train_gan_epoch(gan_step, gan_state: GanState, cls_state, loader, mesh,
                    rng, hardratio, cfg, summary=None, epoch=0):
    """Phase A over the full train loader; returns the fake-cloud dataset
    (parity: train_autoaug.py:119-237 train_gan)."""
    out_buf, label_buf, points_buf = [], [], []
    meters = {k: AverageMeter() for k in ("g_loss", "d_loss", "feedback")}
    hr = jnp.asarray(hardratio, jnp.float32)
    dump = cfg.get("dump_fakedata", False) and cfg.get("run_dir")

    def collect(fetched, i, y_host, x_host):
        # host side of one step (runs one step DELAYED, overlapping the
        # device compute of the next step — values/order are unchanged)
        gen_host, metrics = fetched
        out_buf.append(gen_host)
        label_buf.append(np.asarray(y_host))
        pts = np.asarray(x_host).copy()
        pts[..., :3] = gen_host  # fake xyz + original extra channels
        points_buf.append(pts)
        if dump and i % 10 == 0 and i < 110:
            _dump_fake_batch(cfg, epoch, i, gen_host,
                             np.asarray(x_host)[..., :3], np.asarray(y_host))
        for k in meters:
            meters[k].update(float(metrics[k]))
        if summary is not None:
            for k, v in metrics.items():
                summary.add_scalar(f"train_G_iter/{k}", float(v),
                                   summary.train_iter_num)
            summary.add_scalar("train_G_iter/hardratio", float(hardratio),
                               summary.train_iter_num)
            summary.summary_train_iter_num_update()

    fetch = PipelinedFetcher()
    for i, batch in enumerate(loader):
        rng, sub = jax.random.split(rng)
        sb = shard_batch(mesh, batch)
        gan_state, gen, metrics = gan_step(gan_state, cls_state, sb, sub, hr)
        fetch.push((gen, metrics), collect, i, batch["y"], batch["x"])
    fetch.flush()
    logging.info("GAN epoch: g_loss %.4f d_loss %.4f feedback %.4f",
                 meters["g_loss"].avg, meters["d_loss"].avg,
                 meters["feedback"].avg)
    fake = FormDatasetCls(out_buf, label_buf, points_buf)
    return gan_state, fake, {k: m.avg for k, m in meters.items()}
