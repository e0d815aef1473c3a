"""On-hardware golden check of Pallas kernels vs the XLA reference impls.

Run on a real TPU (the CPU interpreter for pallas deadlocks in this jax build,
so tests/test_ops.py covers the XLA path and this script covers Pallas).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from adaptpoint_tpu.ops.geometry import furthest_point_sample_xla
from adaptpoint_tpu.ops.pallas.fps import furthest_point_sample_pallas


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    for (B, N, npoint) in [(4, 128, 16), (32, 1024, 512), (128, 2048, 1200)]:
        x = jnp.array(rng.standard_normal((B, N, 3)), jnp.float32)
        ref = np.asarray(furthest_point_sample_xla(x, npoint))
        got = np.asarray(furthest_point_sample_pallas(x, npoint))
        ok = (ref == got).all()
        print(f"fps B={B} N={N} npoint={npoint}: match={ok}")
        if not ok:
            bad = np.argwhere(ref != got)
            print("  first mismatches:", bad[:5], ref[tuple(bad[0])], got[tuple(bad[0])])

        # timing
        for name, fn in [("xla", furthest_point_sample_xla),
                         ("pallas", furthest_point_sample_pallas)]:
            fn(x, npoint).block_until_ready()
            t = time.perf_counter()
            iters = 20
            for _ in range(iters):
                out = fn(x, npoint)
            out.block_until_ready()
            dt = (time.perf_counter() - t) / iters
            print(f"  {name}: {dt*1e3:.3f} ms/call  ({B/dt:.0f} clouds/s)")


if __name__ == "__main__":
    main()
