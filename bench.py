"""Benchmark: PointNeXt-S inference throughput on ScanObjectNN shapes.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference PointNeXt-S at 2040 clouds/sec on V100-32GB with
batch 128 x 1024 points (cfgs/scanobjectnn/pointnext-s.yaml:3,
docs/modelzoo.md — see BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CLOUDS_PER_SEC = 2040.0  # V100, reference throughput protocol


def main():
    import jax
    try:  # persistent compile cache: first compile via the remote tunnel is slow
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg

    cfg = EasyConfig()
    cfg.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "cfgs/scanobjectnn/pointnext-s.yaml"), recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)

    B, N = 128, 1024  # reference throughput protocol (examples/profile.py)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)

    def timed_throughput():
        # Honest axon timing (see .claude/skills/verify/SKILL.md): chain each
        # iteration on the previous output so the remote execution layer
        # cannot short-circuit repeated identical calls; force np.asarray
        # host fetch; take the cost as the slope between two iteration
        # counts to cancel fixed dispatch/fetch overhead and one-off stalls.
        @jax.jit
        def forward(p):
            f = jnp.concatenate([p, jnp.abs(p[..., 1:2])], axis=-1)
            logits = model.apply(variables, p, f, training=False)
            return p + 1e-30 * jnp.sum(logits), logits

        _, out = forward(pos)
        np.asarray(out)  # compile + settle

        def run(iters):
            p = pos
            t0 = time.perf_counter()
            for _ in range(iters):
                p, out = forward(p)
            np.asarray(out)
            return time.perf_counter() - t0

        run(3)  # absorb post-compile cache-write stall
        t_lo, t_hi = run(5), run(25)
        return B / ((t_hi - t_lo) / 20)

    try:
        clouds_per_sec = timed_throughput()
    except Exception as e:  # pallas kernel failure: fall back to pure XLA ops
        print(f"# pallas path failed ({type(e).__name__}); XLA fallback",
              file=sys.stderr)
        os.environ["ADAPTPOINT_TPU_KERNELS"] = "xla"
        clouds_per_sec = timed_throughput()

    print(json.dumps({
        "metric": "pointnext-s_scanobjectnn_infer_throughput_128x1024",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec",
        "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
