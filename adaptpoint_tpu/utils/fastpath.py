"""Trace-scoped opt-in for the fused eval-mode SA kernel.

``fused_eval()`` marks the module applications traced inside the ``with``
block as gradient-free eval forwards, letting SetAbstraction lower to the
forward-only fused Pallas stage (ops/pallas/saeval.py: ball-group +
folded-BN MLP + max-pool with no HBM intermediates, no VJP). Callers that
differentiate through the forward — the fake-cloud feedback pass in the
GAN step — must NOT set it.

Same contextvar-at-trace-time design as utils/precision.dtype_override, so
one jit program can mix paths: gan_step wraps only the real-cloud
(stop-gradient) classifier pass.

``ADAPTPOINT_TPU_EVAL_FUSED=1`` additionally turns it on for the plain
eval/validate/test steps (bench.py sets it for throughput numbers; the
framework default keeps the exact unfused path, matching the repo's
bit-exact-eval-by-default convention).
"""
from __future__ import annotations

import contextlib
import contextvars
import os

_FUSED: contextvars.ContextVar = contextvars.ContextVar(
    "adaptpoint_fused_eval", default=False)


@contextlib.contextmanager
def fused_eval(enable: bool = True):
    token = _FUSED.set(bool(enable))
    try:
        yield
    finally:
        _FUSED.reset(token)


def fused_eval_active() -> bool:
    return bool(_FUSED.get())


def fused_eval_env() -> bool:
    return os.environ.get("ADAPTPOINT_TPU_EVAL_FUSED", "0") == "1"


# --- differentiable fused SA scope ------------------------------------------
# Like fused_eval, but for eval-mode forwards that ARE differentiated (the
# GAN step's fake-cloud feedback pass): SetAbstraction lowers to the
# custom-VJP fused stage (ops/pallas/saeval.sa_train_pallas) whose backward
# recomputes in VMEM — the grouped (B,K,M,3+C) tensor never exists in
# either direction.

_FUSED_TRAIN: contextvars.ContextVar = contextvars.ContextVar(
    "adaptpoint_fused_train", default=False)


@contextlib.contextmanager
def fused_train(enable: bool = True):
    token = _FUSED_TRAIN.set(bool(enable))
    try:
        yield
    finally:
        _FUSED_TRAIN.reset(token)


def fused_train_active() -> bool:
    return bool(_FUSED_TRAIN.get())


# Frozen-parameter hint for the fused-train scope: when the caller KNOWS the
# model parameters are not being differentiated (the GAN fake pass feeds a
# FROZEN classifier), the custom-VJP fused SA backward can statically skip
# its weight-gradient matmuls/accumulators — custom_vjp computes cotangents
# for every primal input, so JAX cannot DCE them on its own.

_FROZEN_PARAMS: contextvars.ContextVar = contextvars.ContextVar(
    "adaptpoint_frozen_params", default=False)


@contextlib.contextmanager
def frozen_params(enable: bool = True):
    token = _FROZEN_PARAMS.set(bool(enable))
    try:
        yield
    finally:
        _FROZEN_PARAMS.reset(token)


def frozen_params_active() -> bool:
    return bool(_FROZEN_PARAMS.get())


# --- fused TRAIN-mode (batch-stats BN) SA scope -------------------------------
# Opt-in for the fused train-BN SA stage (ops/pallas/satrainbn.py): the
# classifier TRAINING step (phase B of the AdaptPoint loop) lowers its SA
# stages to the 2-fwd + 2-bwd cross-tile-reduction kernel family — grouped
# tensors and intermediates never touch HBM, BN uses the CURRENT batch's
# statistics exactly like the unfused flax path (same f32 numerics class).
# ``ADAPTPOINT_TPU_TRAIN_FUSED=1`` turns it on for the standard train step.

_FUSED_TRAINBN: contextvars.ContextVar = contextvars.ContextVar(
    "adaptpoint_fused_trainbn", default=False)


@contextlib.contextmanager
def fused_train_bn(enable: bool = True):
    token = _FUSED_TRAINBN.set(bool(enable))
    try:
        yield
    finally:
        _FUSED_TRAINBN.reset(token)


def fused_trainbn_active() -> bool:
    return bool(_FUSED_TRAINBN.get())


def fused_trainbn_env() -> bool:
    return os.environ.get("ADAPTPOINT_TPU_TRAIN_FUSED", "0") == "1"


# --- shared-FPS scope -------------------------------------------------------
# FPS is greedy, so fps(x, m) == fps(x, n)[:m] for m <= n (prefix property;
# see ops.fps_prefix_idx). A caller that runs SEVERAL models over the SAME
# point cloud inside one step (the gan_step: the controller's grouper0 and
# the frozen-classifier real pass both FPS the raw input) can compute the
# longest FPS once and scope it here; the first FPS consumer inside the
# scope takes its prefix instead of relaunching the sequential kernel.
# Trace-time contextvar, same design as fused_eval. The scope must wrap a
# model applied to EXACTLY the cloud the indices were computed from.

_SHARED_FPS: contextvars.ContextVar = contextvars.ContextVar(
    "adaptpoint_shared_fps", default=None)


@contextlib.contextmanager
def shared_first_fps(idx):
    """Scope precomputed FPS indices (B, n) of the model input's cloud;
    the model's FIRST subsampling FPS (npoint <= n, same batch) consumes
    the prefix."""
    token = _SHARED_FPS.set(idx)
    try:
        yield
    finally:
        _SHARED_FPS.reset(token)


def shared_first_fps_idx(batch: int, npoint: int):
    """The scoped prefix (B, npoint) if compatible, else None. Honors the
    same kill-switch as the nested-FPS identity
    (``ADAPTPOINT_TPU_NESTED_FPS=0``) — both are instances of the FPS
    prefix property."""
    if os.environ.get("ADAPTPOINT_TPU_NESTED_FPS", "1") == "0":
        return None
    idx = _SHARED_FPS.get()
    if idx is None:
        return None
    if idx.shape[0] != batch or idx.shape[1] < npoint:
        return None
    return idx[:, :npoint]
