"""Measure the EXACT required window spans per tile size at the controller
grouper shapes, on bench-protocol-like clouds (normalized + gaussian)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.ops.pallas.window import window_prep

STAGES = [(2048, 1024, 0.1), (1024, 512, 0.2), (512, 256, 0.4),
          (256, 128, 0.8)]


def required(xyz, qidx, r, tm):
    B, N, _ = xyz.shape
    M = qidx.shape[1]
    T = M // tm
    ext = jnp.max(xyz, 1) - jnp.min(xyz, 1)
    axis = jnp.argmax(ext, 1)
    keys = jnp.take_along_axis(xyz, axis[:, None, None], 2)[..., 0]
    ks = jnp.sort(keys, 1)
    ck = jnp.take_along_axis(keys, qidx, 1)
    cks = jnp.sort(ck, 1).reshape(B, T, tm)
    lo = jax.vmap(lambda k, q: jnp.searchsorted(k, q))(ks, cks[:, :, 0] - r)
    hi = jax.vmap(lambda k, q: jnp.searchsorted(k, q, side="right"))(
        ks, cks[:, :, -1] + r)
    req = hi - (lo // 128) * 128
    return int(jnp.max(req))


def main():
    rng = np.random.default_rng(0)
    for name, maker in [
        ("normalized", lambda n: (lambda p: p / np.linalg.norm(
            p - p.mean(0), axis=1).max())(rng.standard_normal((n, 3)).astype(np.float32))),
        ("uniform", lambda n: rng.uniform(-1, 1, (n, 3)).astype(np.float32)),
    ]:
        print(f"--- {name} clouds ---")
        for (N, M, R) in STAGES:
            xyz = jnp.asarray(np.stack([maker(N) for _ in range(32)]))
            qidx = jnp.stack([jnp.asarray(rng.choice(N, M, replace=False))
                              for _ in range(32)]).astype(jnp.int32)
            reqs = {tm: required(xyz, qidx, R, tm)
                    for tm in (64, 128, 256) if M % tm == 0}
            print(f"N={N} M={M} r={R}: required " +
                  "  ".join(f"tm={t}:{v} ({v/N:.0%})"
                            for t, v in reqs.items()))


if __name__ == "__main__":
    main()
