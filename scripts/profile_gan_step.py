"""Isolate the 5.5s gan_step mystery: trivial jit with the same huge args
vs the real gan_step, plus a split G-phase/D-phase variant. Run alone."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.parallel import get_mesh, shard_batch
from adaptpoint_tpu.engine.cls_trainer import build_train_tools, init_state
from adaptpoint_tpu.engine.adapt_trainer import build_gan, make_gan_step


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"  {name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo,
                          "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    mesh = get_mesh()
    B, N = 32, 1024
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    generator, discriminator, tx_g, tx_d, gan_state = build_gan(
        cfg, jnp.asarray(batch["x"][:2, :, :3]), key)
    gan_step = make_gan_step(generator, discriminator, tx_g, tx_d, model, cfg)
    sb = shard_batch(mesh, batch)
    n_leaves = len(jax.tree.leaves((gan_state, state, sb)))
    print(f"  arg leaves: {n_leaves}", flush=True)

    @jax.jit
    def trivial(gstate, cstate, b, r, h):
        return jnp.sum(b["x"]) + h

    bench("trivial jit, same args", trivial, gan_state, state, sb, key,
          jnp.float32(3.0))

    out = bench("gan_step", gan_step, gan_state, state, sb, key,
                jnp.float32(3.0))

    # is it per-iteration retracing? count cache entries
    print("  gan_step cache size:", gan_step._cache_size(), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
