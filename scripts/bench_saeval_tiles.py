"""Within-process sweep of ADAPTPOINT_TPU_SAEVAL_TILE on the full
PointNeXt-S fused-eval inference forward (B=128, N=1024)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ADAPTPOINT_TPU_EVAL_DPFJ", "bf16")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.utils import EasyConfig
from adaptpoint_tpu.models import build_model_from_cfg
from adaptpoint_tpu.utils.fastpath import fused_eval


def slope(fn, x0, lo=10, hi=50):
    x = fn(x0)
    np.asarray(x)

    def run(k):
        y = x0
        t0 = time.perf_counter()
        for _ in range(k):
            y = fn(y)
        np.asarray(y)
        return time.perf_counter() - t0

    run(3)
    return (run(hi) - run(lo)) / (hi - lo) * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = EasyConfig()
    cfg.load(os.path.join(repo, "cfgs/scanobjectnn/pointnext-s.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    B, N = 128, 1024
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    x0 = jnp.concatenate([pos, jnp.abs(pos[..., 1:2])], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), pos, x0, training=False)

    for tile in ("256,4", "256,8", "", "128,8", ""):
        if tile:
            os.environ["ADAPTPOINT_TPU_SAEVAL_TILE"] = tile
        else:
            os.environ.pop("ADAPTPOINT_TPU_SAEVAL_TILE", None)

        @jax.jit
        def fwd(p, _t=tile):
            f = jnp.concatenate([p, jnp.abs(p[..., 1:2])], axis=-1)
            with fused_eval():
                logits = model.apply(variables, p, f, training=False)
            return p + 1e-30 * jnp.sum(logits)

        try:
            t = slope(fwd, pos)
            print(f"tile={tile or 'auto':>6}: {t:6.2f} ms "
                  f"= {B / t * 1e3:7.0f} clouds/s", flush=True)
        except Exception as e:
            print(f"tile={tile or 'auto':>6}: FAILED "
                  f"{type(e).__name__}: {str(e)[:90]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
