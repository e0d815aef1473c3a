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

    def _batch_indices(self, order, b):
        idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
        n_valid = len(idxs)
        if n_valid < self.batch_size and self.pad_last:
            pad = np.resize(idxs, self.batch_size - n_valid)
            idxs = np.concatenate([idxs, pad])
        return idxs, n_valid

    def _make_batch(self, order, b, epoch) -> Dict[str, np.ndarray]:
        # epoch is captured at __iter__ time (not read from self) so prefetch
        # futures still in flight when set_epoch() is called — or workers left
        # running by an abandoned iterator — keep the RNG stream of the epoch
        # they were submitted for, preserving bit-identity with inline mode.
        idxs, n_valid = self._batch_indices(order, b)
        samples = []
        for i in idxs:
            sample_rng = np.random.default_rng((self.seed, epoch, int(i)))
            samples.append(self.dataset.get(int(i), sample_rng))
        batch = self._collate(samples)
        batch["n_valid"] = np.asarray(n_valid, np.int32)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        epoch = self.epoch
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        nb = len(self)

        if self.num_workers <= 0:
            for b in range(nb):
                yield self._make_batch(order, b, epoch)
            return

        # multi-worker path (parity: DataLoader num_workers,
        # openpoints/dataset/build.py:79-98): a thread pool assembles whole
        # batches ahead of the consumer — per-sample RNG seeding is identical
        # to the inline path, so batches are bit-identical in either mode.
        # Threads (not processes): transforms are numpy-releasing-GIL and the
        # fixtures are shared in-memory arrays, so fork/pickle buys nothing.
        import collections

        ex = _fut.ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            depth = max(2, self.num_workers)  # batches in flight (prefetch)
            pending = collections.deque(
                ex.submit(self._make_batch, order, b, epoch)
                for b in range(min(depth, nb)))
            next_b = len(pending)
            while pending:
                batch = pending.popleft().result()
                if next_b < nb:
                    pending.append(
                        ex.submit(self._make_batch, order, next_b, epoch))
                    next_b += 1
                yield batch
        finally:
            ex.shutdown(wait=False, cancel_futures=True)
