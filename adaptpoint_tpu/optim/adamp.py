"""AdamP / SGDP as optax gradient transformations.

Parity: openpoints/optim/adamp.py:25-105 and openpoints/optim/sgdp.py
(Heo et al., "Slowing Down the Weight Norm Increase in Momentum-based
Optimizers"): when a multi-dim parameter's gradient is nearly orthogonal to
the parameter (cosine similarity below delta/sqrt(dim) in channel or layer
view — the scale-invariant case created by BatchNorm), the radial component
of the update is projected out and weight decay is damped by wd_ratio.
The data-dependent branch is a jnp.where (XLA-friendly), numerically
equivalent to the reference's python `if`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["adamp", "sgdp"]


def _project(p, grad, perturb, delta: float, wd_ratio: float, eps: float):
    """Channel-view then layer-view projection (parity: adamp.py:25-40).
    Returns (perturb', wd) with traced selection instead of python control
    flow."""
    if p.ndim <= 1:
        return perturb, jnp.float32(1.0)

    def cos_and_proj(view):
        pv = view(p)
        gv = view(grad)
        cos = jnp.abs(jnp.sum(pv * gv, 1)) / (
            jnp.linalg.norm(pv, axis=1) * jnp.linalg.norm(gv, axis=1) + eps)
        hit = jnp.max(cos) < delta / jnp.sqrt(jnp.float32(pv.shape[1]))
        expand = (-1,) + (1,) * (p.ndim - 1)
        p_n = p / (jnp.linalg.norm(pv, axis=1) + eps).reshape(expand)
        pert = perturb - p_n * jnp.sum(view(p_n * perturb),
                                       1).reshape(expand)
        return hit, pert

    chan = lambda x: x.reshape(x.shape[0], -1)
    layer = lambda x: x.reshape(1, -1)
    hit_c, pert_c = cos_and_proj(chan)
    hit_l, pert_l = cos_and_proj(layer)
    pert = jnp.where(hit_c, pert_c, jnp.where(hit_l, pert_l, perturb))
    wd = jnp.where(hit_c | hit_l, jnp.float32(wd_ratio), jnp.float32(1.0))
    return pert, wd


class _AdamPState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def adamp(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
          delta=0.1, wd_ratio=0.1, nesterov=False):
    def init_fn(params):
        return _AdamPState(jnp.zeros((), jnp.int32),
                           jax.tree.map(jnp.zeros_like, params),
                           jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        count = state.count + 1
        bc1 = 1.0 - b1 ** count
        bc2 = 1.0 - b2 ** count
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)

        def one(p, g, m, v):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            pert = ((b1 * m + (1 - b1) * g) / denom if nesterov
                    else m / denom)
            pert, wd = _project(p, g, pert, delta, wd_ratio, eps)
            step = learning_rate / bc1
            upd = -step * pert
            if weight_decay > 0:
                upd = upd - learning_rate * weight_decay * wd * p
            return upd

        updates = jax.tree.map(one, params, grads, mu, nu)
        return updates, _AdamPState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


class _SGDPState(NamedTuple):
    momentum: optax.Updates


def sgdp(learning_rate, momentum=0.9, dampening=0.0, eps=1e-8,
         weight_decay=0.0, delta=0.1, wd_ratio=0.1, nesterov=False):
    """parity: openpoints/optim/sgdp.py (SGD momentum + the same
    projection)."""
    def init_fn(params):
        return _SGDPState(jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        buf = jax.tree.map(lambda b, g: momentum * b + (1 - dampening) * g,
                           state.momentum, grads)

        def one(p, g, b):
            d_p = g + momentum * b if nesterov else b
            d_p, wd = _project(p, g, d_p, delta, wd_ratio, eps)
            upd = -learning_rate * d_p
            if weight_decay > 0:
                upd = upd - (learning_rate * weight_decay * wd
                             / (1 - dampening)) * p
            return upd

        updates = jax.tree.map(one, params, grads, buf)
        return updates, _SGDPState(buf)

    return optax.GradientTransformation(init_fn, update_fn)
