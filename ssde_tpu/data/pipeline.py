"""Host batching + prefetch.

Replaces torch ``DataLoader(num_workers=12, pin_memory=True)``
(reference trainer.py:155-163) with a thread-pool loader that decodes/
collates ahead of the training step and double-buffers batches so host IO
overlaps TPU compute. Heavy per-pixel work lives on device
(``transforms.preprocess_batch``), so worker threads only decode JPEGs and
stack numpy arrays.
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def collate(items):
    """Stack a list of item dicts into one batch dict."""
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        out[k] = np.stack(vals).astype(np.float32)
    return out


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._rng = random.Random(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(idx)
        bs = self.batch_size
        stop = len(idx) - (len(idx) % bs) if self.drop_last else len(idx)
        for i in range(0, stop, bs):
            yield idx[i : i + bs]

    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in self._index_batches():
                    items = list(pool.map(self.dataset.__getitem__, batch_idx))
                    q.put(collate(items))
            q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
