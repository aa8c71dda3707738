"""Host input pipeline: threaded sample workers + batching + device prefetch.

Replaces the reference's torch DataLoader(num_workers=2|8) + .cuda() copies
(scripts_cvppp/main.py:227-238) with a worker pool filling a bounded queue
(sample building is numpy/cv2 — it releases the GIL) and an optional
double-buffered jax.device_put prefetcher so host->HBM transfer overlaps the
previous step's compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np


def collate(samples: list[dict]) -> dict:
    """Stack a list of sample dicts into batched arrays."""
    out = {}
    for key in samples[0]:
        out[key] = np.stack([s[key] for s in samples], axis=0)
    return out


class ThreadedSampler:
    """Workers repeatedly call dataset.sample(rng) into a bounded queue."""

    def __init__(self, dataset, num_workers: int = 2, queue_size: int = 8,
                 seed: int = 0):
        self.dataset = dataset
        self.q: queue.Queue = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self.threads = []
        for i in range(num_workers):
            rng = np.random.default_rng(seed * 1000 + i)
            t = threading.Thread(target=self._worker, args=(rng,), daemon=True)
            t.start()
            self.threads.append(t)

    def _worker(self, rng):
        while not self._stop.is_set():
            try:
                s = self.dataset.sample(rng)
            except Exception as e:  # surface worker failures to the consumer
                self.q.put(e)
                return
            while not self._stop.is_set():
                try:
                    self.q.put(s, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def get(self):
        item = self.q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()


class Provider:
    """Infinite batch provider: next() -> batched numpy dict."""

    def __init__(self, dataset, batch_size: int = 2, num_workers: int = 2,
                 seed: int = 0):
        self.batch_size = batch_size
        self.sampler = ThreadedSampler(dataset, num_workers=num_workers,
                                       seed=seed)

    def next(self) -> dict:
        return collate([self.sampler.get() for _ in range(self.batch_size)])

    def close(self):
        self.sampler.close()


def device_prefetch(batches: Iterator[dict], sharding=None, depth: int = 2):
    """Double-buffered host->device transfer: yields device batches while the
    next transfer is in flight."""
    import jax

    buf = []
    it = iter(batches)

    multiprocess = sharding is not None and jax.process_count() > 1

    def put(b):
        if multiprocess:
            # sharding spans non-addressable devices: assemble global
            # arrays from the (identically-seeded) full local batch
            from ..parallel.multihost import global_batch

            return global_batch(b, sharding)
        if sharding is not None:
            return {k: jax.device_put(v, sharding) for k, v in b.items()}
        return {k: jax.device_put(v) for k, v in b.items()}

    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
