"""Model profiler: params, FLOPs (XLA cost analysis), throughput.

Parity: examples/profile.py:22-120 — the reference reports deepspeed-profiler
FLOPs/params and a wall-clock throughput loop with cuda sync; here FLOPs come
from jit-lowered XLA cost analysis and timing uses block_until_ready.
"""
from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import build_model_from_cfg

__all__ = ["profile_model"]


def profile_model(cfg, batch_size: int = 128, num_points: int = None,
                  iters: int = 30):
    num_points = num_points or cfg.get("num_points", 1024)
    cfg.model.in_channels = cfg.model.get(
        "in_channels", None) or cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    in_channels = int(cfg.model.in_channels)

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((batch_size, num_points, 3)),
                      jnp.float32)
    extra = jnp.abs(pos[..., 1:2])
    x = jnp.concatenate([pos, extra], -1)[..., :in_channels]
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)

    n_params = sum(v.size for v in jax.tree_util.tree_leaves(variables["params"]))

    fwd = jax.jit(lambda p, f: model.apply(variables, p, f, training=False))
    lowered = fwd.lower(pos, x)
    compiled = lowered.compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops")
    except Exception:
        pass

    compiled(pos, x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(pos, x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    throughput = batch_size / dt

    gflops_per_cloud = flops / batch_size / 1e9 if flops else float("nan")
    logging.info("params: %.4f M", n_params / 1e6)
    logging.info("FLOPs/cloud: %.3f G (batch flops %s)", gflops_per_cloud, flops)
    logging.info("throughput: %.1f clouds/sec (B=%d, N=%d)",
                 throughput, batch_size, num_points)
    print(f"params_M={n_params / 1e6:.4f} GFLOPs_per_cloud={gflops_per_cloud:.3f} "
          f"throughput={throughput:.1f}")
    return {"params": n_params, "flops_per_cloud": gflops_per_cloud,
            "throughput": throughput}
