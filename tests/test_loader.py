"""NumpyLoader semantics: multi-worker prefetch path must produce batches
bit-identical to the inline path (same per-sample RNG seeding), padding +
n_valid behavior, and epoch reshuffling."""
import numpy as np

from adaptpoint_tpu.datasets.loader import NumpyLoader


class _SlowDataset:
    """In-memory dataset whose get() applies a per-sample random transform."""

    def __init__(self, n=37, num_points=16):
        self.data = np.arange(n * num_points * 3, dtype=np.float32).reshape(
            n, num_points, 3)
        self.labels = np.arange(n) % 5

    def __len__(self):
        return len(self.data)

    def get(self, idx, rng):
        jitter = rng.standard_normal(self.data[idx].shape).astype(np.float32)
        return {"x": self.data[idx] + 0.01 * jitter,
                "y": np.int64(self.labels[idx])}


def _collect(loader):
    return list(loader)


def test_multiworker_matches_inline():
    ds = _SlowDataset()
    kw = dict(batch_size=8, shuffle=True, drop_last=False, seed=3)
    inline = NumpyLoader(ds, num_workers=0, **kw)
    threaded = NumpyLoader(ds, num_workers=4, **kw)
    inline.set_epoch(2)
    threaded.set_epoch(2)
    b0, b1 = _collect(inline), _collect(threaded)
    assert len(b0) == len(b1) == 5
    for a, b in zip(b0, b1):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_padding_and_n_valid():
    ds = _SlowDataset(n=10)
    loader = NumpyLoader(ds, batch_size=8, num_workers=2)
    batches = _collect(loader)
    assert [int(b["n_valid"]) for b in batches] == [8, 2]
    assert batches[1]["x"].shape[0] == 8  # padded to full batch


def test_drop_last_and_epoch_shuffle():
    ds = _SlowDataset(n=20)
    loader = NumpyLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                         num_workers=2, seed=0)
    loader.set_epoch(1)
    e1 = _collect(loader)
    loader.set_epoch(2)
    e2 = _collect(loader)
    assert len(e1) == len(e2) == 2
    assert not all(np.array_equal(a["y"], b["y"]) for a, b in zip(e1, e2))
