"""Feasibility probe for VERDICT r4 #2 (opt-in nearest-K grouping):
measure the 1D sorted-axis window span required to cover the K NEAREST
in-radius neighbors (vs round 4's radius-ball cover, which needed 51-100%
of N on normalized clouds and killed the windowed kernel).

Under nearest-K semantics a tile of centers only needs to see each
center's K-th-NN horizon h_c = min(r, d_K(c)) — points within h_c in 3D
are within h_c along any axis, so the window [key_c - h_c, key_c + h_c]
contains the K nearest. The static per-tile window must fit the worst
tile; this prints that span as a fraction of N per stage/tile size on the
same cloud families as scripts/check_window_spans.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

# (N, M, r, K): controller groupers K=24 r=.1/.2/.4/.8 (adapt/augmentor.py
# PointsetGrouper) + classifier enc1 (pointnext-s r=0.15 K=32)
STAGES = [(2048, 1024, 0.1, 24), (1024, 512, 0.2, 24), (512, 256, 0.4, 24),
          (256, 128, 0.8, 24), (2048, 1024, 0.15, 32)]


def required_nearest(xyz, qidx, r, k, tm):
    """Max over tiles of the sorted-key window (rounded down to a 128
    multiple at the low edge, like window_prep) covering every center's
    min(r, d_k) horizon."""
    B, N, _ = xyz.shape
    M = qidx.shape[1]
    T = M // tm
    worst = 0
    for b in range(B):
        p = xyz[b]
        ext = p.max(0) - p.min(0)
        keys = p[:, int(np.argmax(ext))]
        order = np.argsort(keys)
        ks = keys[order]
        centers = p[qidx[b]]
        d2 = ((centers[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        dk = np.sqrt(np.partition(d2, k - 1, axis=1)[:, k - 1])
        h = np.minimum(dk, r)
        ck = keys[qidx[b]]
        o = np.argsort(ck)
        ck_s, h_s = ck[o], h[o]
        for t in range(T):
            c = ck_s[t * tm:(t + 1) * tm]
            hh = h_s[t * tm:(t + 1) * tm]
            lo = np.searchsorted(ks, (c - hh).min())
            hi = np.searchsorted(ks, (c + hh).max(), side="right")
            worst = max(worst, hi - (lo // 128) * 128)
    return worst


def main():
    rng = np.random.default_rng(0)

    def normalized(n):
        p = rng.standard_normal((n, 3)).astype(np.float32)
        return p / np.linalg.norm(p - p.mean(0), axis=1).max()

    def uniform(n):
        return rng.uniform(-1, 1, (n, 3)).astype(np.float32)

    for name, maker in [("normalized", normalized), ("uniform", uniform)]:
        print(f"--- {name} clouds ---")
        for (N, M, R, K) in STAGES:
            xyz = np.stack([maker(N) for _ in range(16)])
            qidx = np.stack([rng.choice(N, M, replace=False)
                             for _ in range(16)]).astype(np.int32)
            reqs = {tm: required_nearest(xyz, qidx, R, K, tm)
                    for tm in (64, 128, 256) if M % tm == 0}
            print(f"N={N} M={M} r={R} K={K}: required " +
                  "  ".join(f"tm={t}:{v} ({v / N:.0%})"
                            for t, v in reqs.items()), flush=True)


if __name__ == "__main__":
    main()
