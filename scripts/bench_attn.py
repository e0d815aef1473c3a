"""Within-process comparison of flash-attention tile sizes at the mask-head
training shape (BH=128, N=2048, d=16). Chained slope timing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def slope(fn, x0, lo=10, hi=60):
    x = fn(x0)
    np.asarray(x)

    def run(k):
        y = x0
        t0 = time.perf_counter()
        for _ in range(k):
            y = fn(y)
        np.asarray(y)
        return time.perf_counter() - t0

    run(2)
    return (run(hi) - run(lo)) / (hi - lo) * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    BH, N, D = 128, 2048, 16
    q = jnp.asarray(rng.standard_normal((BH, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BH, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BH, N, D)), jnp.float32)
    scale = D ** 0.5

    for tm in ("", "256", "512", "1024"):
        if tm:
            os.environ["ADAPTPOINT_TPU_ATTN_TM"] = tm
        else:
            os.environ.pop("ADAPTPOINT_TPU_ATTN_TM", None)
        # fresh module import not needed: tile read at trace time; but jit
        # cache keyed by fn identity — build fresh closures
        from adaptpoint_tpu.ops.pallas.attention import mha_pallas

        @jax.jit
        def fwd(x, _tm=tm):
            o = mha_pallas(x, k, v, scale)
            return x + 1e-30 * jnp.sum(o[0, 0])

        @jax.jit
        def fb(x, _tm=tm):
            def loss(q_):
                return jnp.mean(mha_pallas(q_, k, v, scale) ** 2)
            return x + 1e-6 * jax.grad(loss)(x)

        tf = slope(fwd, q)
        tb = slope(fb, q)
        print(f"tm={tm or 'auto':>5}: fwd {tf:6.2f} ms  fwd+bwd {tb:6.2f} ms",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
