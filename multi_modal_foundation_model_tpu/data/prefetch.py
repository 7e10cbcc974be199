"""Background host->device batch prefetching (streaming-loader pipeline).

For splits too large to keep HBM-resident (multi-session pretraining over
hundreds of sessions — the ``device_resident_data`` path covers the
single-session case), the per-batch ``device_put`` otherwise serializes
with compute: the host thread blocks on the transfer, the device idles,
and in-loop throughput collapses (measured 10x through a tunneled backend,
RESULTS.md). This is the standard flax ``prefetch_to_device`` pattern: a
daemon thread pulls batches from the host iterator, places them on device,
and keeps up to ``depth`` placed batches queued so transfer overlaps the
previous step's compute.

The reference's analog is ``torch.utils.data.DataLoader`` worker processes
(never enabled: ``num_workers`` defaults, ``loader/make_loader.py:49-51``).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
U = TypeVar("U")

_SENTINEL = object()


class DevicePrefetcher(Iterator[U]):
    """Iterate ``place(item)`` for items of ``it``, with placement running
    ``depth`` items ahead on a daemon thread. Exceptions from the producer
    re-raise in the consumer at the failing position.

    An abandoned iterator (consumer raised mid-epoch, or was never
    drained) does not strand the producer: puts poll a stop event, which
    ``close()`` — also invoked by ``__del__`` at GC — sets, letting the
    thread exit and release its queued (device) batches."""

    def __init__(self, it: Iterable[T], place: Callable[[T], U],
                 depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err = None
        self._stop = threading.Event()
        self._finished = False

        def put(item) -> bool:
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def run():
            try:
                for item in it:
                    if not put(place(item)):
                        return          # consumer gone; drop remainder
            except BaseException as e:  # noqa: BLE001 — re-raised on consume
                self._err = e
            finally:
                put(_SENTINEL)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Release the producer thread (safe to call more than once)."""
        self._stop.set()
        self._finished = True

    def __del__(self):
        self._stop.set()

    def __iter__(self) -> "DevicePrefetcher[U]":
        return self

    def __next__(self) -> U:
        if self._finished:
            raise StopIteration
        item = self._q.get()
        if item is _SENTINEL:
            self._finished = True
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
