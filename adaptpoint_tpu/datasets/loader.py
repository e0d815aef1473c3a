"""Minimal numpy batch loader.

Replaces torch DataLoader + DistributedSampler (reference:
openpoints/dataset/build.py:54-98). Host-side: per-sample transforms run in
numpy, batches are stacked contiguous arrays ready for a single device_put.
Fixed batch shapes: with ``drop_last=False`` the final partial batch is padded
to full size and ``n_valid`` reports the real count, so jit'd eval never
recompiles on ragged batches.
"""
from __future__ import annotations

import concurrent.futures as _fut
from typing import Dict, Iterator, Optional

import numpy as np

__all__ = ["NumpyLoader"]


class NumpyLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 pad_last: bool = True, num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.pad_last = pad_last
        self.epoch = 0
        self.num_workers = num_workers

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _collate(self, samples) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for key in samples[0]:
            vals = [np.asarray(s[key]) for s in samples]
            out[key] = np.stack(vals, axis=0)
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, self.epoch))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        nb = len(self)

        def fetch(i):
            sample_rng = np.random.default_rng((self.seed, self.epoch, int(i)))
            return self.dataset.get(int(i), sample_rng)

        for b in range(nb):
            idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
            n_valid = len(idxs)
            if n_valid < self.batch_size and self.pad_last:
                pad = np.resize(idxs, self.batch_size - n_valid)
                idxs = np.concatenate([idxs, pad])
            samples = [fetch(i) for i in idxs]
            batch = self._collate(samples)
            batch["n_valid"] = np.asarray(n_valid, np.int32)
            yield batch
