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
