"""A/B the phase-B classifier train step (bench protocol: B=32, fake
N=2048 clouds, FPS->1200 -> rand 1024 inside the step) with and without
the fused train-BN SA kernel family (ADAPTPOINT_TPU_TRAIN_FUSED=1,
ops/pallas/satrainbn.py). Chained slope timings per axon rules."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.parallel import get_mesh, shard_batch
from adaptpoint_tpu.engine.cls_trainer import (build_train_tools, init_state,
                                               make_train_step)


def _slope(step, x0, lo=3, hi=15):
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
    B, N = 32, 2048
    batch = {"x": rng.standard_normal((B, N, 4)).astype(np.float32),
             "y": rng.integers(0, 15, B).astype(np.int64)}
    key = jax.random.PRNGKey(0)
    criterion, tx, _ = build_train_tools(cfg, model)
    state = init_state(cfg, model, tx, key, batch)
    fb = shard_batch(mesh, batch)
    lr = jnp.float32(cfg.lr)

    for tag, env in (("unfused", "0"), ("fused-trainbn", "1")):
        os.environ["ADAPTPOINT_TPU_TRAIN_FUSED"] = env
        train_step = make_train_step(model, tx, criterion, cfg)

        @jax.jit
        def phase_b(st, _step=train_step):
            st2, loss, _ = _step(st, fb, key, lr)
            return st2

        t = _slope(phase_b, state)
        print(f"{tag}: {t * 1e3:.2f} ms/step  ({B / t:.1f} clouds/s)",
              flush=True)


if __name__ == "__main__":
    main()
