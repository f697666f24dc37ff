"""Async batch loader and device prefetch.

Replaces the reference's 16-process ``torch.utils.data.DataLoader``
(``/root/reference/train.py:99``) with a thread-pool loader (decode/augment
release the GIL in numpy) plus a double-buffered device prefetcher, so the
H2D copy of batch N+1 overlaps the TPU step on batch N. An optional C++
loader (csrc/) slots in behind the same interface for the hot SID path.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional, Sequence

import numpy as np


class Loader:
    """Iterates shuffled, collated batches from a dataset with ``sample()``.

    Dataset protocol: ``__len__`` and ``sample(idx, rng) -> tuple of arrays``.
    Yields tuples of stacked numpy arrays [B, ...].
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_threads: int = 8,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self, epoch: int):
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        step = self.batch_size
        end = (n // step) * step if self.drop_last else n
        for i in range(0, end, step):
            yield order[i : i + step]

    def __iter__(self) -> Iterator:
        epoch = self._epoch
        self._epoch += 1
        sample_seed = (self.seed, epoch, 0xA5)

        def load_one(idx: int, k: int):
            rng = np.random.default_rng((*sample_seed, int(idx), k))
            return self.dataset.sample(int(idx), rng)

        batch_indices = list(self._batches(epoch))
        if not batch_indices:
            return iter(())

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_threads) as pool:
                    for bi, idxs in enumerate(batch_indices):
                        if stop.is_set():
                            return
                        samples = list(pool.map(lambda i: load_one(i, bi), idxs))
                        batch = tuple(
                            np.stack([s[j] for s in samples]) for j in range(len(samples[0]))
                        )
                        out_q.put(batch)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        def gen():
            try:
                while True:
                    item = out_q.get()
                    if item is None:
                        return
                    yield item
            finally:
                stop.set()
                # Drain so the producer can exit.
                while thread.is_alive():
                    try:
                        out_q.get_nowait()
                    except queue.Empty:
                        thread.join(timeout=0.1)

        return gen()


def prefetch_to_device(iterator, sharding=None, size: int = 2):
    """Move batches to device ahead of consumption (double buffering)."""
    import jax

    buf: "queue.Queue" = queue.Queue()
    it = iter(iterator)

    def put_next() -> bool:
        try:
            batch = next(it)
        except StopIteration:
            return False
        if sharding is not None:
            batch = jax.device_put(batch, sharding)
        else:
            batch = jax.device_put(batch)
        buf.put(batch)
        return True

    alive = True
    for _ in range(size):
        alive = alive and put_next()
    while not buf.empty():
        out = buf.get()
        if alive:
            alive = put_next()
        yield out
