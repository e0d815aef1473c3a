"""Round-end serialized TPU validation: every Pallas code path golden-checked
against the XLA composite, plus one real GAN step and the throughput bench.
Run alone — concurrent TPU processes contaminate timings."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.ops import (ball_group, ball_query, gather_rows,
                                index_points)
from adaptpoint_tpu.ops.geometry import furthest_point_sample_xla
from adaptpoint_tpu.ops.pallas.fps import furthest_point_sample_pallas
from adaptpoint_tpu.ops import _ball_group_xla


def check(name, a, b, exact=False):
    a, b = np.asarray(a), np.asarray(b)
    if exact:
        ok = (a == b).all()
        print(f"  {name}: exact={bool(ok)}")
        return bool(ok)
    err = float(np.max(np.abs(a - b)))
    print(f"  {name}: maxerr={err:.2e}")
    return err < 1e-4


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    ok = True

    # FPS
    x = jnp.asarray(rng.standard_normal((16, 512, 3)), jnp.float32)
    ok &= check("fps", furthest_point_sample_pallas(x, 128),
                furthest_point_sample_xla(x, 128), exact=True)

    # gather_rows
    from adaptpoint_tpu.ops.pallas.gather import gather_rows_pallas
    idx = furthest_point_sample_pallas(x, 128)
    ok &= check("gather_rows", gather_rows_pallas(x, idx),
                index_points(x, idx), exact=True)

    # golden sections pin the bit-exact 3-split gather mode
    os.environ["ADAPTPOINT_TPU_GATHER_SPLITS"] = "3"

    # ball_group relative+normalized and raw (augmentor path)
    feats = jnp.asarray(rng.standard_normal((16, 512, 64)), jnp.float32)

    # dispatching index_points with rank-3 idx (FP / EdgeConv / knn path)
    from adaptpoint_tpu.ops.geometry import index_points as ip_xla
    idx3 = jnp.asarray(rng.integers(0, 512, (16, 128, 24)), jnp.int32)
    ok &= check("index_points rank3", index_points(feats, idx3),
                ip_xla(feats, idx3), exact=True)
    for rel, norm in [(True, True), (False, False)]:
        got = ball_group(0.2, 16, x, idx, feats, rel, norm)
        ref = _ball_group_xla(0.2, 16, x, idx, feats, rel, norm)
        tag = f"ballgroup rel={rel}"
        ok &= check(f"{tag} new_xyz", got[0], ref[0])
        ok &= check(f"{tag} fi", got[1], ref[1])
        ok &= check(f"{tag} dpfj", got[2], ref[2])
        ok &= check(f"{tag} idx", got[3], ref[3], exact=True)

    # fast default gather mode (2-split, ~19 mantissa bits): indices stay
    # exact, values within 1e-3 of the f32 gather
    os.environ.pop("ADAPTPOINT_TPU_GATHER_SPLITS", None)
    got = ball_group(0.2, 16, x, idx, feats, True, True)
    ref = _ball_group_xla(0.2, 16, x, idx, feats, True, True)
    err = float(np.max(np.abs(np.asarray(got[2]) - np.asarray(ref[2]))))
    idx_exact = bool((np.asarray(got[3]) == np.asarray(ref[3])).all())
    print(f"  ballgroup fast-mode (2-split): maxerr={err:.2e} "
          f"idx_exact={idx_exact}", flush=True)
    ok &= (err < 1e-3) and idx_exact

    # one real GAN step on hardware (augmentor + discriminator + feedback)
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg
    from adaptpoint_tpu.parallel import get_mesh, shard_batch
    from adaptpoint_tpu.engine.cls_trainer import build_train_tools, init_state
    from adaptpoint_tpu.engine.adapt_trainer import build_gan, make_gan_step

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo, "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml"),
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
    criterion, tx, _ = build_train_tools(cfg, model, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    generator, discriminator, tx_g, tx_d, gan_state = build_gan(
        cfg, jnp.asarray(batch["x"][:2, :, :3]), key)
    gan_step = make_gan_step(generator, discriminator, tx_g, tx_d, model, cfg)
    sb = shard_batch(mesh, batch)
    hr = jnp.float32(3.0)  # hoisted: fresh eager scalars per iter stall axon
    t0 = time.perf_counter()
    gan_state, gen, gm = gan_step(gan_state, state, sb, key, hr)
    _ = np.asarray(gen)  # forced fetch = true completion
    compile_s = time.perf_counter() - t0

    def run(k, gs0):
        gs = gs0
        t0 = time.perf_counter()
        for _ in range(k):
            gs, gen, _gm = gan_step(gs, state, sb, key, hr)
        np.asarray(gen)
        return time.perf_counter() - t0

    run(2, gan_state)  # absorb any post-compile cache-write stall
    # per-iter cost from the slope (subtracts fixed dispatch/fetch overhead)
    t5, t20 = run(5, gan_state), run(20, gan_state)
    dt = (t20 - t5) / 15
    print(f"  GAN step (B={B}, N={N}): {dt*1e3:.1f} ms "
          f"({B/dt:.0f} clouds/s phase-A) g={float(gm['g_loss']):.3f} "
          f"d={float(gm['d_loss']):.3f} fb={float(gm['feedback']):.3f} "
          f"[compile {compile_s:.0f}s]", flush=True)

    print("ALL_OK" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
