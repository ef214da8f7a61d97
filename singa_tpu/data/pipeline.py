"""Host-side prefetch: background featurization/loading feeding the device.

Replaces the reference's torch DataLoader worker processes
(/root/reference/utils/Data.py:234-253) with a double-buffered background
thread that overlaps npz loading + host collation with device compute, and
optionally pre-transfers batches to the device mesh.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional


class Prefetcher:
    """Wrap a batch iterable with an N-deep background prefetch queue."""

    def __init__(
        self,
        source: Iterable,
        depth: int = 2,
        device_put_fn=None,
    ):
        self._source = source
        self._depth = depth
        self._put = device_put_fn or (lambda x: x)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._source:
                if self._stop.is_set():
                    return
                self._q.put(self._put(item))
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            self._q.put(None)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is None:
                if self._err is not None:
                    raise self._err
                return
            yield item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
