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
    ready, each already placed on device when ``sharding`` is given.

    A consumer that abandons iteration early (break / exception) must not
    strand the producer on the bounded queue pinning device buffers for the
    process lifetime — close() (also called on GC and at StopIteration)
    sets a stop flag and drains the queue so the producer's next put
    returns and the thread exits."""

    _DONE = object()

    def __init__(self, iterator, depth: int = 2, sharding=None):
        self._q = queue.Queue(maxsize=depth)
        self._err = None
        self._stop = threading.Event()

        def produce():
            try:
                for item in iterator:
                    if self._stop.is_set():
                        return
                    if sharding is not None:
                        item = jax.tree.map(lambda a: jax.device_put(a, sharding), item)
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                # the sentinel MUST arrive at a live consumer even when the
                # queue is full at iterator exhaustion (put_nowait here
                # deadlocked the consumer's q.get()); give up only once
                # close() has marked the consumer gone
                while not self._stop.is_set():
                    try:
                        self._q.put(self._DONE, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=produce, daemon=True)
        self._thread.start()

    def close(self):
        """Release the producer thread and its queued (device) buffers."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break

    def __del__(self):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration  # never block on a queue nobody fills
        item = self._q.get()
        if item is self._DONE:
            self._stop.set()
            if self._err is not None:
                err, self._err = self._err, None
                raise err
            raise StopIteration
        return item


def prefetch(iterator, depth: int = 2, sharding=None):
    """prefetch(loader.epoch(e)) -> iterator with IO hidden behind compute."""
    return PrefetchIterator(iterator, depth, sharding)
