"""AdaHessian parity vs the reference torch implementation
(openpoints/optim/adahessian.py) on a quadratic with a known Hessian —
the Hutchinson estimate z*(Hz) is exact there (z*az = a), so the whole
update must match the torch step bit-for-bit (up to f32)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from adaptpoint_tpu.optim import build_optimizer_from_cfg
from adaptpoint_tpu.optim.adahessian import (adahessian,
                                             hutchinson_hess_diag)


def _torch_adahessian_steps(p0, a, lr, wd, n_steps, hessian_power=1.0):
    """Reference step math (adahessian.py:104-157) on loss = 0.5*sum(a p^2):
    grad = a*p, exact hessian diag = a (what set_hessian converges to)."""
    p = torch.tensor(np.array(p0), dtype=torch.float64)
    av = torch.tensor(np.array(a), dtype=torch.float64)
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    exp_avg = torch.zeros_like(p)
    exp_h_sq = torch.zeros_like(p)
    for step in range(1, n_steps + 1):
        g = av * p
        hess = av  # z * (H z) = a * z^2 = a for Rademacher z
        p = p * (1 - lr * wd)
        exp_avg = exp_avg * beta1 + g * (1 - beta1)
        exp_h_sq = exp_h_sq * beta2 + hess * hess * (1 - beta2)
        bc1 = 1 - beta1 ** step
        bc2 = 1 - beta2 ** step
        denom = (exp_h_sq / bc2) ** (hessian_power / 2) + eps
        p = p - (lr / bc1) * exp_avg / denom
    return p.numpy()


def test_adahessian_matches_torch_reference():
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((8, 16)).astype(np.float32)
    a = (rng.random((8, 16)) + 0.5).astype(np.float32)
    lr, wd, n_steps = 0.01, 1e-2, 5

    params = {"w": jnp.asarray(p0)}
    av = {"w": jnp.asarray(a)}
    tx = adahessian(lr, weight_decay=wd)
    st = tx.init(params)

    def grad_fn(p):
        return jax.tree.map(lambda pi, ai: ai * pi, p, av)

    key = jax.random.PRNGKey(0)
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        g = grad_fn(params)
        hd = hutchinson_hess_diag(
            lambda p: jax.tree.map(lambda pi, ai: ai * pi, p, av),
            params, sub)
        # quadratic: the probe is exact
        np.testing.assert_allclose(np.asarray(hd["w"]), a, rtol=1e-6)
        up, st = tx.update(g, st, params, hess_diag=hd)
        params = optax.apply_updates(params, up)

    ref = _torch_adahessian_steps(p0, a, lr, wd, n_steps)
    assert np.max(np.abs(np.asarray(params["w"]) - ref)) < 2e-6


def test_adahessian_via_factory_and_jit():
    """Factory-built adahessian (inject_hyperparams + clip chain) accepts
    hess_diag under jit, decays only >=2-D params."""
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    tx = build_optimizer_from_cfg(params, lr=0.01, NAME="adahessian",
                                  weight_decay=0.1, grad_norm_clip=10.0)
    st = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    hess = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def step(st, params):
        up, st = tx.update(grads, st, params, hess_diag=hess)
        return optax.apply_updates(params, up), st

    p2, st = step(st, params)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(p2))
    # decoupled wd applies to the 2-D weight, not the 1-D bias
    dw = float(jnp.mean(params["w"] - p2["w"]))
    db = float(jnp.mean(params["b"] - p2["b"]))
    assert dw > db


def test_adahessian_one_model_step():
    """End-to-end: hess_diag wiring in make_train_step (second-order HVP
    through a BN model under jit)."""
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.engine.cls_trainer import (build_train_tools,
                                                   init_state,
                                                   make_train_step)
    from adaptpoint_tpu.parallel import get_mesh, shard_batch

    cfg = EasyConfig({
        "num_points": 32, "num_classes": 4, "lr": 0.01,
        "optimizer": {"NAME": "adahessian", "weight_decay": 0.01},
        "criterion_args": {"NAME": "CrossEntropy"},
        "sched": "cosine", "epochs": 2, "t_max": 2, "min_lr": 1e-4,
        "warmup_epochs": 0,
        "model": {"NAME": "BaseCls",
                  "in_channels": 4,
                  "encoder_args": {"NAME": "DGCNN", "in_channels": 4,
                                   "channels": 8, "embed_dim": 16,
                                   "n_blocks": 2, "k": 4},
                  "cls_args": {"NAME": "ClsHead", "num_classes": 4,
                               "mlps": [16],
                               "norm_args": {"norm": "bn1d"}}}})
    model = build_model_from_cfg(cfg.model)
    rng = np.random.default_rng(0)
    batch = {"x": rng.standard_normal((8, 32, 4)).astype(np.float32),
             "y": rng.integers(0, 4, 8).astype(np.int64)}
    criterion, tx, lr_fn = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    criterion, tx, lr_fn = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, criterion, cfg)
    mesh = get_mesh()
    sb = shard_batch(mesh, batch)
    new_state, loss, preds = step(state, sb, jax.random.PRNGKey(1),
                                  jnp.float32(0.01))
    assert bool(jnp.isfinite(loss))
    moved = any(bool(jnp.any(p != q)) for p, q in
                zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)))
    assert moved
