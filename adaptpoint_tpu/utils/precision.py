"""Trace-scoped compute-dtype policy.

``dtype_override('bfloat16')`` scopes a bf16 compute policy to the module
applications traced inside the ``with`` block (a contextvar read at Flax
trace time), so ONE jit program can mix policies — e.g. the AdaptPoint
gan_step runs the controller and the frozen feedback classifier in bf16
while the phase-B classifier train step (a different trace) stays f32.
Params remain f32 throughout (flax param_dtype); only matmul/norm compute
and activation storage drop to bf16, and flax computes BN statistics in
f32 regardless of policy.

Precedence: contextvar override > ``ADAPTPOINT_TPU_DTYPE`` env > float32.
"""
from __future__ import annotations

import contextlib
import contextvars
import os

import jax.numpy as jnp

_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "adaptpoint_dtype_override", default=None)


def _parse(name):
    if name is None:
        return None
    if not isinstance(name, str):
        return name
    return (jnp.bfloat16 if name.lower() in ("bf16", "bfloat16")
            else jnp.float32)


@contextlib.contextmanager
def dtype_override(dtype):
    """Scope a compute dtype ('bfloat16'/'float32'/None) over traced modules."""
    tok = _OVERRIDE.set(_parse(dtype))
    try:
        yield
    finally:
        _OVERRIDE.reset(tok)


def resolve_compute_dtype():
    """Active compute dtype: contextvar override, else env policy, else f32."""
    ov = _OVERRIDE.get()
    if ov is not None:
        return ov
    return (jnp.bfloat16
            if os.environ.get("ADAPTPOINT_TPU_DTYPE", "").lower()
            in ("bf16", "bfloat16") else jnp.float32)
