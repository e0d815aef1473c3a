"""On-TPU golden + perf check of the Pallas kNN kernel vs the XLA
iterative path (run alone)."""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from adaptpoint_tpu.ops.pallas.knn import knn_pallas
from adaptpoint_tpu.ops.geometry import knn_point as knn_xla

def slope(name, step, x0, lo=3, hi=12):
    x = step(x0); np.asarray(jax.tree.leaves(x)[0])
    def run(c):
        y = x0; t0 = time.perf_counter()
        for _ in range(c): y = step(y)
        np.asarray(jax.tree.leaves(y)[0]); return time.perf_counter()-t0
    run(2)
    print(f"{name:34s} {(run(hi)-run(lo))/(hi-lo)*1e3:8.3f} ms", flush=True)

rng = np.random.default_rng(0)
for (B, M, N, C, K) in [(8, 256, 256, 3, 24), (128, 1024, 1024, 64, 20),
                        (32, 2048, 1024, 3, 24), (128, 1024, 1024, 131, 40)]:
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, M, C)), jnp.float32)
    d_ref, i_ref = jax.jit(lambda a, b: knn_xla(K, a, b))(x, q)
    d_got, i_got = jax.jit(lambda a, b: knn_pallas(K, a, b))(x, q)
    i_ref, i_got = np.asarray(i_ref), np.asarray(i_got)
    d_ref, d_got = np.asarray(d_ref), np.asarray(d_got)
    mism = (i_ref != i_got).sum()
    # idx can differ at d2 ties/ulps; verify the DISTANCES agree
    derr = np.max(np.abs(np.sort(d_ref, -1) - np.sort(d_got, -1)))
    print(f"B={B} M={M} N={N} C={C} K={K}: idx mismatch {mism}/{i_ref.size} "
          f"d2 err {derr:.2e}", flush=True)
    @jax.jit
    def pstep(q):
        d, i = knn_pallas(K, x, q)
        return q + 1e-30 * (jnp.sum(d) + jnp.sum(i.astype(jnp.float32)))
    @jax.jit
    def xstep(q):
        d, i = knn_xla(K, x, q)
        return q + 1e-30 * (jnp.sum(d) + jnp.sum(i.astype(jnp.float32)))
    slope("  pallas", pstep, q)
    slope("  xla", xstep, q)
