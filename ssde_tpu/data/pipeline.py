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
    """Stack a list of item dicts into one batch dict.

    uint8 frames (the decoded-cache fast path, data/kitti.py
    load_resized_uint8) stay uint8 — 4x less host->device traffic; the
    device-side preprocess converts to float.
    """
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        arr = np.stack(vals)
        out[k] = arr if arr.dtype == np.uint8 else arr.astype(np.float32)
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
        use_processes: bool = False,
    ):
        """``use_processes``: decode in worker processes instead of threads.

        PIL holds the GIL for part of each JPEG decode, so thread pools
        saturate below core count at high feed rates; process workers match
        the reference's 12-process DataLoader (trainer.py:155-157). Measure
        with scripts/bench_loader.py before switching — processes pay a
        per-batch pickling cost.
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.use_processes = use_processes
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

    def _make_pool(self):
        if self.use_processes:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            return ProcessPoolExecutor(
                self.num_workers, mp_context=mp.get_context("fork"),
                initializer=_init_worker, initargs=(self.dataset,),
            )
        return ThreadPoolExecutor(self.num_workers)

    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        fetch = _worker_getitem if self.use_processes else self.dataset.__getitem__

        def produce():
            with self._make_pool() as pool:
                for batch_idx in self._index_batches():
                    items = list(pool.map(fetch, batch_idx))
                    q.put(collate(items))
            q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


# --- process-pool worker state (fork: dataset inherited, initializer keeps a
# module-global so per-item pickling ships only the integer index) ---
_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_getitem(index):
    return _WORKER_DATASET[index]
