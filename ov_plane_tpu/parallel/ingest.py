"""Host-side sensor ingestion pipeline (SURVEY §2.4 item 4).

The reference ingests sensors through ROS callbacks + a sorted camera queue
drained by an update thread (ROS1Visualizer.cpp:426-471). The TPU-native
analogue is a *prefetch pipeline*: a background thread stages the next
frames (disk read / JPEG decode / optional ``jax.device_put`` into HBM)
while the filter processes the current one, so host IO never serializes
with device compute.

``Prefetcher`` wraps any iterator of items; ``stage`` maps each item on the
background thread (decode, device_put, ...). Queue depth bounds host-memory
use. Exceptions propagate to the consumer; iteration order is preserved
(the serial-replay determinism contract of ros1_serial_msckf).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax

_SENTINEL = object()


class Prefetcher:
    """Iterate ``items`` with ``stage`` applied ``depth`` elements ahead on a
    background thread."""

    def __init__(self, items: Iterable[Any], stage: Optional[Callable[[Any], Any]] = None,
                 depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stage = stage or (lambda x: x)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._done = False
        self._thread = threading.Thread(target=self._run, args=(iter(items),), daemon=True)
        self._thread.start()

    def _run(self, it: Iterator[Any]):
        try:
            for item in it:
                staged = self._stage(item)
                # Bounded put that notices close(): a consumer that stops
                # early must not leave this thread parked on a full queue
                # holding staged buffers for the rest of the process.
                while not self._stop.is_set():
                    try:
                        self._q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # propagate to the consumer
            self._err = e
        finally:
            # The sentinel must never be dropped: a consumer slower than the
            # producer (the normal case) drains the queue and then blocks
            # forever in __next__ if the sentinel was lost to queue.Full.
            # Use the same bounded put-with-stop-check as for items.
            while not self._stop.is_set():
                try:
                    self._q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def close(self):
        """Stop the producer and drop staged items. Safe to call repeatedly;
        consumers that break out of iteration early should call this."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)
        self._done = True

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            if self._err is not None:
                raise self._err  # re-raise persistently, never block
            raise StopIteration
        while True:
            try:
                item = self._q.get(timeout=1.0)
                break
            except queue.Empty:
                if not self._thread.is_alive():
                    # Producer died without a sentinel reaching us (e.g. a
                    # concurrent close()); drain once more then terminate.
                    try:
                        item = self._q.get_nowait()
                        break
                    except queue.Empty:
                        self._done = True
                        if self._err is not None:
                            raise self._err
                        raise StopIteration
        if item is _SENTINEL:
            self._thread.join()
            self._done = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def device_prefetch(arrays: Iterable[Any], device=None, depth: int = 2) -> Prefetcher:
    """Prefetch pytrees into device memory ``depth`` steps ahead — the
    device-resident ring buffer feeding the filter. ``device`` defaults to
    the first accelerator."""
    dev = device if device is not None else jax.devices()[0]
    return Prefetcher(arrays, stage=lambda x: jax.device_put(x, dev), depth=depth)
