"""Benchmark headline: AdaptPoint two-phase TRAIN throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Protocol (reference AdaptPoint training, train_autoaug.py:119-237 +
:463-523): phase A = one fused G+D adversarial step with frozen-classifier
feedback on a (B=32, N=2048) batch; phase B = one classifier train step on
the generated clouds (FPS 2048->1200 -> random 1024 inside the step).
clouds/sec = B / (t_phaseA + t_phaseB).

Baseline (see BASELINE.md "A100 AdaptPoint baseline methodology"): the
reference publishes no AdaptPoint train throughput on any GPU. We estimate
an A100 figure from its published V100 PointNeXt-S inference throughput
(2040 clouds/s, cfgs/scanobjectnn/pointnext-s.yaml:3) x2.5 (A100/V100 peak
ratio), divided by the hardware-independent FLOP ratio between the
two-phase step and the inference pass (15.47, XLA cost analysis). This is
GENEROUS to the GPU (assumes it sustains inference-level efficiency on the
gather/FPS-heavy GAN step), so vs_baseline is conservative.

Secondary metric (also reported): PointNeXt-S inference throughput at the
reference protocol (128 x 1024), vs the published 2040 clouds/s V100 figure.

Delivery contract (VERDICT r4 #1): a parseable JSON line is printed the
moment the train number exists — the inference add-on runs only if wall
budget remains, then a second (superset) JSON line replaces it.  The
health gate waits at most BENCH_HEALTH_WAIT_S (240 s default); the compile
cache is durable (seeded from the committed .jax_cache_bench.tar.gz when
the local cache dir is cold — machine swaps wipe /tmp but not the repo).
Run `bash scripts/ci_tpu.sh` to prewarm + refresh the tarball.
"""
import json
import os
import sys
import time

_T0 = time.monotonic()
# Worst-case wall budget (driver timeout insurance). Stages that have not
# started by the time the budget is this close to spent are skipped.
BENCH_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "560"))


def _trace(msg):
    print(f"# bench +{time.monotonic() - _T0:.0f}s: {msg}", file=sys.stderr,
          flush=True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Opt into the fast eval modes for throughput numbers: bf16 dpfj storage in
# eval-mode grouping and the fused eval SA kernel (argmax-parity tested;
# the framework DEFAULT is f32 / unfused).
os.environ.setdefault("ADAPTPOINT_TPU_EVAL_DPFJ", "bf16")
os.environ.setdefault("ADAPTPOINT_TPU_EVAL_FUSED", "1")

V100_INFER_CLOUDS_PER_SEC = 2040.0  # published reference figure
A100_OVER_V100 = 2.5                # bf16/fp16 tensor peak ratio
TWO_PHASE_OVER_INFER_FLOPS = 15.47  # XLA cost analysis (BASELINE.md)
A100_TRAIN_EST = V100_INFER_CLOUDS_PER_SEC * A100_OVER_V100 \
    / TWO_PHASE_OVER_INFER_FLOPS    # ~329.7 clouds/s


def _slope(step, x0, lo=3, hi=9):
    """Chained slope timing (axon rules: chain on the output, np.asarray
    fetch, slope between two iteration counts)."""
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


def bench_adaptpoint_train():
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

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo, "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    mesh = get_mesh()

    B, N = 32, 2048
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

    # Carry (gan_state, gen) through the chained slope so ONE compiled
    # program both times phase A and provides the phase-B input (a separate
    # un-nested gan_step call costs its own ~31MB executable + a minute of
    # cold compile through the tunnel — the round-4 delivery lesson).
    @jax.jit
    def phase_a_c(carry):
        gs, _ = carry
        gs2, gen, _ = gan_step(gs, state, sb, key, hr)
        return gs2, gen

    carry0 = (gan_state, jnp.zeros((B, N, 3), jnp.float32))
    t_a = _slope(phase_a_c, carry0)

    # phase B input: generated clouds at N=2048 with the height feature.
    # With cfg.scan_batches: K > 1 the classifier epoch runs through the
    # lax.scan multi-batch executor (one dispatch per K batches; measured
    # per-batch-neutral at this protocol — the step is device-bound — but
    # it amortizes host dispatch for fast-model/small-batch configs).
    # t_b is the per-batch cost either way.
    from adaptpoint_tpu.engine.cls_trainer import make_train_step_scan
    _, gen = phase_a_c(carry0)
    fake = np.asarray(jnp.concatenate([gen, jnp.abs(gen[..., 1:2])], -1))
    K = int(cfg.get("scan_batches", 1) or 1)
    if K > 1:
        scan_step = make_train_step_scan(model, tx, criterion, cfg)
        from adaptpoint_tpu.parallel import shard_batch_stack
        fbs = shard_batch_stack(
            mesh, [{"x": np.roll(fake, k, axis=0),
                    "y": np.roll(batch["y"], k, axis=0)}
                   for k in range(K)])

        @jax.jit
        def phase_b(st):
            st2, losses, _ = scan_step(st, fbs, key, lr)
            return st2

        t_b = _slope(phase_b, state) / K
    else:
        fb = shard_batch(mesh, {"x": fake, "y": batch["y"]})

        @jax.jit
        def phase_b(st):
            st2, loss, _ = train_step(st, fb, key, lr)
            return st2

        t_b = _slope(phase_b, state)
    return B / (t_a + t_b), t_a, t_b


def bench_infer():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo, "cfgs/scanobjectnn/pointnext-s.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)

    B, N = 128, 1024
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    x = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    # jitted init: eager flax init dispatches hundreds of tiny ops through
    # the tunnel (~2-3 min of the round-4 cold wall); one compiled program
    # is seconds and cacheable
    variables = jax.jit(model.init, static_argnames=("training",))(
        jax.random.PRNGKey(0), pos, x, training=False)

    from adaptpoint_tpu.utils.fastpath import fused_eval, fused_eval_env

    @jax.jit
    def forward(p):
        f = jnp.concatenate([p, jnp.abs(p[..., 1:2])], axis=-1)
        with fused_eval(fused_eval_env()):
            logits = model.apply(variables, p, f, training=False)
        return p + 1e-30 * jnp.sum(logits)

    t = _slope(forward, pos, lo=5, hi=25)
    return B / t


def _seed_compile_cache(cache_dir: str) -> None:
    """Seed the persistent compile cache from the committed tarball.

    The axon cold-compile wall (~9 min through the tunnel) is the round-4
    delivery failure; /tmp does not survive machine swaps, the repo does.
    """
    import tarfile
    repo = os.path.dirname(os.path.abspath(__file__))
    tarball = os.path.join(repo, ".jax_cache_bench.tar.gz")
    try:
        if not os.path.exists(tarball):
            return
        os.makedirs(cache_dir, exist_ok=True)
        have = set(os.listdir(cache_dir))
        with tarfile.open(tarball, "r:gz") as tf:
            members = [m for m in tf.getmembers()
                       if m.isfile() and os.path.basename(m.name) not in have]
            for m in members:
                data = tf.extractfile(m).read()
                with open(os.path.join(cache_dir,
                                       os.path.basename(m.name)), "wb") as f:
                    f.write(data)
        if members:
            _trace(f"seeded {len(members)} compile-cache entries from tarball")
    except Exception as e:  # cache is an optimization, never fatal
        _trace(f"cache seed skipped ({type(e).__name__}: {e})")


def _wait_for_healthy_device(max_wait_s: float = None,
                             probe_ms_threshold: float = 250.0) -> None:
    """Block until the device round-trip is sane before measuring.

    The tunneled TPU relay has documented degraded windows (STATUS.md:
    a 256x256 matmul once took 357 s end-to-end). Timing the workload
    during such a window would record tunnel latency, not device
    throughput. Probe with 10 chained tiny matmuls; proceed once the
    per-call round-trip is under ``probe_ms_threshold`` (healthy sessions
    measure ~1-20 ms), or after ``max_wait_s`` (default BENCH_HEALTH_WAIT_S
    env, 240 s — VERDICT r4: a bench that sleeps past the driver budget
    delivers nothing; a flagged-degraded number beats an empty artifact)
    with a warning on stderr (the number is then printed anyway, flagged
    "relay_degraded").
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("BENCH_HEALTH_WAIT_S", "240"))
    deadline = time.monotonic() + max_wait_s
    f = jax.jit(lambda a: a @ a)
    while True:
        try:
            x = jnp.ones((256, 256), jnp.float32)
            np.asarray(f(x))  # compile + first call
            t0 = time.perf_counter()
            y = x
            for _ in range(10):
                y = f(y)
            np.asarray(y)
            per_call_ms = (time.perf_counter() - t0) * 1e2
            if per_call_ms <= probe_ms_threshold:
                return
            msg = f"probe {per_call_ms:.0f} ms/call"
        except Exception as e:  # transient tunnel errors: retry too
            msg = f"probe raised {type(e).__name__}: {e}"
        if time.monotonic() >= deadline:
            print(f"# bench: relay still degraded after {max_wait_s:.0f}s "
                  f"({msg}); measuring anyway", file=sys.stderr)
            global _RELAY_DEGRADED
            _RELAY_DEGRADED = True
            return
        print(f"# bench: relay degraded ({msg}); retrying in 30s",
              file=sys.stderr, flush=True)
        time.sleep(30.0)


_RELAY_DEGRADED = False


def main():
    import jax
    # repo-local default (gitignored): /tmp does not survive machine swaps;
    # the repo checkout usually does, and scripts/ci_tpu.sh prewarms it.
    cache_dir = os.environ.get(
        "ADAPTPOINT_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache_bench"))
    try:  # persistent compile cache: first compile via the tunnel is slow
        _seed_compile_cache(cache_dir)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if jax.default_backend() != "cpu":
        _trace("health probe")
        _wait_for_healthy_device()

    try:
        _trace("train bench (compile + slope)")
        train_cps, t_a, t_b = bench_adaptpoint_train()
        headline = {
            "metric": "adaptpoint_train_clouds_per_sec_b32_n2048",
            "value": round(train_cps, 1),
            "unit": "clouds/sec/chip",
            "vs_baseline": round(train_cps / A100_TRAIN_EST, 3),
            "baseline": "A100 estimate 329.7 clouds/s (BASELINE.md methodology)",
            "baseline_is_estimate": True,
            "phase_a_ms": round(t_a * 1e3, 1),
            "phase_b_ms": round(t_b * 1e3, 1),
            **({"relay_degraded": True} if _RELAY_DEGRADED else {}),
        }
        # Deliver the headline NOW (VERDICT r4 #1a): if the driver's
        # timeout lands during the add-on, the tail still parses.
        print(json.dumps(headline), flush=True)
        elapsed = time.monotonic() - _T0
        if elapsed > BENCH_BUDGET_S - 150:
            _trace(f"skipping inference add-on (elapsed {elapsed:.0f}s)")
            return
        try:
            _trace("inference add-on")
            infer_cps = bench_infer()
            headline.update(
                {"infer_clouds_per_sec_128x1024": round(infer_cps, 1),
                 "infer_vs_v100": round(
                     infer_cps / V100_INFER_CLOUDS_PER_SEC, 3)})
            print(json.dumps(headline), flush=True)
        except Exception as e:
            _trace(f"inference add-on failed ({type(e).__name__}: {e}); "
                   f"headline already delivered")
    except Exception as e:  # fall back to the inference metric
        print(f"# adaptpoint train bench failed ({type(e).__name__}: {e}); "
              f"falling back to inference metric", file=sys.stderr)
        os.environ.setdefault("ADAPTPOINT_TPU_KERNELS", "xla")
        infer_cps = bench_infer()
        print(json.dumps({
            "metric": "pointnext-s_scanobjectnn_infer_throughput_128x1024",
            "value": round(infer_cps, 1),
            "unit": "clouds/sec",
            "vs_baseline": round(infer_cps / V100_INFER_CLOUDS_PER_SEC, 3),
        }), flush=True)
    _trace(f"done (total {time.monotonic() - _T0:.0f}s)")


if __name__ == "__main__":
    main()
