"""AdaHessian: adaptive second-order optimizer (Yao et al., 2020).

Parity: openpoints/optim/adahessian.py:9-157 (vendored davda54/ada-hessian).
Same update math — decoupled AdamW-style weight decay, EMA of the gradient
and of the *squared Hutchinson Hessian-diagonal estimate*, bias correction,
``hessian_power`` exponent on the denominator. The torch version owns the
Hutchinson probe inside optimizer.step() via a second autograd pass
(adahessian.py:76-101 set_hessian); in JAX the probe is a pure function of
the loss — ``hutchinson_hess_diag`` computes z * (H @ z) with one
jvp-of-grad (forward-over-reverse HVP), and the train step passes it to the
transform as the ``hess_diag`` extra arg. ``avg_conv_kernel`` (spatial
averaging of conv-kernel traces, torch :122-123) is not exposed: the
reference factory never enables it.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["adahessian", "hutchinson_hess_diag"]


class AdaHessianState(NamedTuple):
    count: jnp.ndarray
    exp_avg: Any
    exp_hessian_diag_sq: Any


def adahessian(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 0.0,
               hessian_power: float = 1.0,
               mask=None) -> optax.GradientTransformationExtraArgs:
    """AdaHessian as an optax transform taking ``hess_diag`` as an extra arg
    (the Hutchinson estimate from :func:`hutchinson_hess_diag`)."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdaHessianState(count=jnp.zeros((), jnp.int32),
                               exp_avg=zeros,
                               exp_hessian_diag_sq=jax.tree.map(
                                   jnp.zeros_like, params))

    def update(updates, state, params=None, *, hess_diag=None, **extra):
        del extra
        if hess_diag is None:
            raise ValueError(
                "adahessian requires the hess_diag extra arg "
                "(hutchinson_hess_diag of the loss at the current params)")
        count = state.count + 1
        m = jax.tree.map(lambda mu, g: b1 * mu + (1 - b1) * g,
                         state.exp_avg, updates)
        v = jax.tree.map(lambda nu, h: b2 * nu + (1 - b2) * h * h,
                         state.exp_hessian_diag_sq, hess_diag)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        k = hessian_power

        def leaf_update(mu, nu, p, use_wd):
            denom = (nu / bc2) ** (k / 2.0) + eps
            step = -(learning_rate / bc1) * mu / denom
            if weight_decay and params is not None and use_wd:
                # decoupled decay p *= (1 - lr*wd)  (adahessian.py:126)
                step = step - learning_rate * weight_decay * p
            return step

        if params is None:
            out = jax.tree.map(lambda mu, nu: leaf_update(mu, nu, None, False),
                               m, v)
        elif mask is not None:
            out = jax.tree.map(leaf_update, m, v, params, mask)
        else:
            out = jax.tree.map(lambda mu, nu, p: leaf_update(mu, nu, p, True),
                               m, v, params)
        return out, AdaHessianState(count=count, exp_avg=m,
                                    exp_hessian_diag_sq=v)

    return optax.GradientTransformationExtraArgs(init, update)


def hutchinson_hess_diag(grad_fn, params, rng, n_samples: int = 1):
    """Hutchinson estimate of the Hessian diagonal: E_z[z * (H @ z)] with
    Rademacher z (parity: adahessian.py:94-101 set_hessian). ``grad_fn`` is
    params -> grads; the HVP is forward-over-reverse (jvp of grad_fn)."""
    flat, tree = jax.tree.flatten(params)
    total = None
    for key in jax.random.split(rng, n_samples):
        ks = jax.random.split(key, len(flat))
        z = jax.tree.unflatten(tree, [
            jax.random.rademacher(k, p.shape, dtype=p.dtype)
            for k, p in zip(ks, flat)])
        _, hvp = jax.jvp(grad_fn, (params,), (z,))
        contrib = jax.tree.map(jnp.multiply, hvp, z)
        total = contrib if total is None else jax.tree.map(
            jnp.add, total, contrib)
    return jax.tree.map(lambda a: a / n_samples, total)
