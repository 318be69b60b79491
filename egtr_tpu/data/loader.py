"""Batching data loader with background prefetch.

Replaces the reference's torch ``DataLoader(collate_fn)`` (train_egtr.py:
624-640). Groups samples into static shape buckets (so each batch maps to
one compiled program), pads targets, and prefetches batches on a background
thread so host preprocessing overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from .transforms import collate, default_buckets, pick_bucket


class Loader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool,
                 max_gt: int, num_rel_labels: int,
                 buckets: Optional[Sequence[Tuple[int, int]]] = None,
                 seed: int = 42, drop_last: bool = False,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.max_gt = max_gt
        self.num_rel_labels = num_rel_labels
        self.buckets = tuple(buckets) if buckets else default_buckets(
            getattr(dataset, "max_size", 1333))
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, idxs):
        samples = [self.dataset[i] for i in idxs]
        # one bucket for the whole batch: the max over samples
        hs = max(s.image.shape[0] for s in samples)
        ws = max(s.image.shape[1] for s in samples)
        bucket = pick_bucket(hs, ws, self.buckets)
        return collate(samples, bucket, self.max_gt, self.num_rel_labels)

    def _index_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            idxs = order[i:i + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                return
            yield idxs

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        if self.prefetch <= 0:
            for idxs in self._index_batches():
                yield self._make_batch(idxs)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for idxs in self._index_batches():
                    q.put(self._make_batch(idxs))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
