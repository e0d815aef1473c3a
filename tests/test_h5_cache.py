"""Memoized h5 split loading (corruption sweeps re-open every -C split)."""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from adaptpoint_tpu.datasets.data_util import load_h5_cached


def _write(path, n=4, val=1.0):
    with h5py.File(path, "w") as f:
        f["data"] = np.full((n, 8, 3), val, np.float32)
        f["label"] = np.arange(n, dtype=np.int64).reshape(-1, 1)


def test_cache_hit_and_invalidation(tmp_path):
    p = str(tmp_path / "clean.h5")
    _write(p, val=1.0)
    pts1, lab1 = load_h5_cached(p)
    pts2, lab2 = load_h5_cached(p)
    assert pts1 is pts2 and lab1 is lab2  # served from cache
    assert not pts1.flags.writeable  # shared arrays are read-only
    with pytest.raises(ValueError):
        pts1[0, 0, 0] = 9.0

    # rewriting the file (different size -> different key) invalidates
    _write(p, n=5, val=2.0)
    pts3, _ = load_h5_cached(p)
    assert pts3.shape[0] == 5 and float(pts3[0, 0, 0]) == 2.0


def test_dataset_get_still_returns_writable_copies(tmp_path):
    p = str(tmp_path / "clean.h5")
    _write(p)
    from adaptpoint_tpu.datasets.scanobjectnn import ScanObjectNNC
    ds = ScanObjectNNC(data_dir=str(tmp_path), split="clean", num_points=8)
    d = ds.get(0, np.random.default_rng(0))
    d["pos"][0, 0] = 42.0  # per-sample copies stay mutable
    assert float(ds.points[0, 0, 0]) == 1.0
