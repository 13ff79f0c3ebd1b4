"""Batching iterator with host->device prefetch.

Replaces the reference's torch DataLoader worker-process pipeline
(segmentation.py:72-79) with a thread that stages the next numpy batch while
the device computes, overlapping NIfTI decode + preprocessing with training
(TPU transfers are async; one batch of look-ahead keeps the chip fed for
batch=1 volumetric workloads).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


def _stack_samples(samples: Sequence[dict]) -> dict:
    """Stack a list of sample dicts into a batch dict of arrays; non-array
    values (names) become lists."""
    out: dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Epoch-oriented batch iterator over an indexable dataset.

    Args:
      dataset: supports ``__len__`` and ``__getitem__`` -> sample dict (or a
        tuple of sample dicts for registration pairs).
      batch_size: samples per batch (volumes must share shapes).
      shuffle: reshuffle indices each epoch.
      drop_last: drop the trailing partial batch (static shapes on TPU
        prefer full batches).
      prefetch: number of batches staged ahead by the background thread
        (0 disables threading).
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = True, seed: int = 0, prefetch: int = 2,
                 collate: Optional[Callable] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.collate = collate or self._default_collate
        self._rng = np.random.RandomState(seed)

    @staticmethod
    def _default_collate(samples):
        if isinstance(samples[0], tuple):
            n = len(samples[0])
            return tuple(_stack_samples([s[i] for s in samples])
                         for i in range(n))
        return _stack_samples(samples)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]

    def _produce(self):
        for batch_idx in self._batch_indices():
            samples = [self.dataset[int(i)] for i in batch_idx]
            yield self.collate(samples)

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._produce()
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error_holder = []

        def worker():
            try:
                for batch in self._produce():
                    q.put(batch)
            except BaseException as e:  # surface loader errors to the consumer
                error_holder.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error_holder:
                    raise error_holder[0]
                return
            yield item


def endless(loader: DataLoader) -> Iterator[dict]:
    """Cycle a loader forever (the reference restarts its epoch iterator on
    exhaustion, segmentation.py:143-147)."""
    while True:
        yield from loader
