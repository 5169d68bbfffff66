"""Background-thread batch prefetching with device placement.

The reference hides host-side decode/augmentation latency behind torch
DataLoader worker processes (data.py:278). Here a lightweight thread
pipeline does the same for our loaders: the producer thread runs PIL/numpy
work and (optionally) starts the host->device transfer, so the accelerator
step never waits on image IO.
"""

from __future__ import annotations

import queue
import threading

import jax


class PrefetchIterator:
    """Wraps an iterator; a daemon thread keeps up to ``depth`` batches
    ready, each already placed on device when ``sharding`` is given."""

    _DONE = object()

    def __init__(self, iterator, depth: int = 2, sharding=None):
        self._q = queue.Queue(maxsize=depth)
        self._err = None

        def produce():
            try:
                for item in iterator:
                    if sharding is not None:
                        item = jax.tree.map(lambda a: jax.device_put(a, sharding), item)
                    self._q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=produce, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterator, depth: int = 2, sharding=None):
    """prefetch(loader.epoch(e)) -> iterator with IO hidden behind compute."""
    return PrefetchIterator(iterator, depth, sharding)
