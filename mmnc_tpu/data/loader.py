"""Batching, shuffling, and device prefetch for task-dict datasets.

TPU-native replacement for the reference's torch DataLoader + collate
(SURVEY.md C14, L0): datasets yield {task: HWC float32}; the loader stacks
them into {task: (B,H,W,C)} batches, and `prefetch_to_device` keeps the
next batch's H2D copy in flight (on a background thread) while the current
step runs — the host pipeline never stalls the chip.
"""

import queue
import threading
from typing import Iterator, Optional

import numpy as np
import jax


class BatchLoader:
    """Iterates {task: (B, H, W, C) np.float32} batches.

    drop_last is always on (static shapes keep XLA from recompiling).

    Fast paths, in order of preference:
    * datasets exposing `get_batch(indices)` (e.g. PrerenderedDataset) are
      fetched with one vectorized call per batch — no per-sample Python;
    * `num_workers > 0` fetches samples on a thread pool (the reference's
      DataLoader num_workers analog, src/train.py:193-198 — useful for
      IO-bound datasets like CLEVR-on-disk; numpy/PIL release the GIL).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 21, num_epochs: Optional[int] = 1,
                 num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_epochs = num_epochs
        self.num_workers = num_workers
        self._pool = None

    def close(self):
        """Shut down the worker pool (idempotent)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):
        self.close()

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def _epoch_order(self, epoch: int):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        return order

    def _fetch(self, idx):
        if hasattr(self.dataset, "get_batch"):
            return self.dataset.get_batch(idx)
        if self.num_workers > 0:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(self.num_workers)
            samples = list(self._pool.map(
                lambda i: self.dataset[int(i)], idx))
        else:
            samples = [self.dataset[int(i)] for i in idx]
        return {t: np.stack([s[t] for s in samples])
                for t in samples[0].keys()}

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        order = self._epoch_order(epoch)
        n_batches = len(self)
        for b in range(n_batches):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            yield self._fetch(idx)

    def __iter__(self):
        epoch = 0
        while self.num_epochs is None or epoch < self.num_epochs:
            yield from self.epoch(epoch)
            epoch += 1


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator with a background thread that stages
    batches onto the device (optionally with a NamedSharding) ahead of use."""
    q = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for batch in iterator:
                if sharding is not None:
                    batch = jax.tree.map(
                        lambda x: jax.device_put(x, sharding), batch)
                else:
                    batch = jax.tree.map(jax.device_put, batch)
                q.put(batch)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
