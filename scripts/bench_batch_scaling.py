"""Batch-amortization study: two-phase AdaptPoint step at B=32/64/128.

The headline bench (bench.py) pins the reference protocol B=32, N=2048
(train_autoaug.py:119-237). This script measures how the per-chip
throughput amortizes when the batch grows (same N, same models, same
two-phase structure) — the "larger-batch protocols" lever from the
round-4 close-out: the one-hot gather build and the XLA fusion tails are
partly latency/overhead-bound at B=32, so clouds/s should rise with B
until the MXU/VPU floors dominate.

NOT the headline: changing B changes optimizer-steps-per-sample, so these
numbers are an amortization measurement, not reference-protocol parity.

Usage: python scripts/bench_batch_scaling.py [B ...]   (default 32 64 128)
Prints one JSON line per batch size.
"""
import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

os.environ.setdefault("ADAPTPOINT_TPU_EVAL_DPFJ", "bf16")
os.environ.setdefault("ADAPTPOINT_TPU_EVAL_FUSED", "1")

A100_TRAIN_EST = 2040.0 * 2.5 / 15.47  # BASELINE.md methodology (~329.7)


def _slope(step, x0, lo=3, hi=9):
    import jax
    import numpy as np
    x = step(x0)
    np.asarray(jax.tree.leaves(x)[0])

    def run(k):
        y = x0
        t0 = time.perf_counter()
        for _ in range(k):
            y = step(y)
        np.asarray(jax.tree.leaves(y)[0])
        return time.perf_counter() - t0

    run(2)
    return (run(hi) - run(lo)) / (hi - lo)


def bench_at_batch(B: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.parallel import get_mesh, shard_batch
    from adaptpoint_tpu.engine.cls_trainer import (build_train_tools,
                                                   init_state,
                                                   make_train_step)
    from adaptpoint_tpu.engine.adapt_trainer import build_gan, make_gan_step

    cfg = EasyConfig()
    cfg.load(os.path.join(
        repo, "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
        recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    mesh = get_mesh()

    N = 2048
    rng = np.random.default_rng(0)
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    criterion, tx, _ = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    gen_m, dis_m, tx_g, tx_d, gan_state = build_gan(
        cfg, jnp.asarray(batch["x"][:2, :, :3]), key)
    gan_step = make_gan_step(gen_m, dis_m, tx_g, tx_d, model, cfg)
    train_step = make_train_step(model, tx, criterion, cfg)
    sb = shard_batch(mesh, batch)
    hr = jnp.float32(3.0)
    lr = jnp.float32(cfg.lr)

    @jax.jit
    def phase_a(gs):
        gs2, gen, _ = gan_step(gs, state, sb, key, hr)
        return gs2

    t_a = _slope(phase_a, gan_state)

    _, gen, _ = gan_step(gan_state, state, sb, key, hr)
    fake = np.asarray(jnp.concatenate([gen, jnp.abs(gen[..., 1:2])], -1))
    fb = shard_batch(mesh, {"x": fake, "y": batch["y"]})

    @jax.jit
    def phase_b(st):
        st2, loss, _ = train_step(st, fb, key, lr)
        return st2

    t_b = _slope(phase_b, state)
    return B / (t_a + t_b), t_a, t_b


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    sizes = [int(a) for a in sys.argv[1:]] or [32, 64, 128]
    for B in sizes:
        cps, t_a, t_b = bench_at_batch(B)
        print(json.dumps({
            "metric": f"adaptpoint_train_clouds_per_sec_b{B}_n2048",
            "value": round(cps, 1),
            "unit": "clouds/sec/chip",
            "vs_a100_estimate": round(cps / A100_TRAIN_EST, 3),
            "phase_a_ms": round(t_a * 1e3, 1),
            "phase_b_ms": round(t_b * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
