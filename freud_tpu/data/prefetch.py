"""Cancellable background-thread prefetch, shared by every pipeline.

One implementation of the subtle parts — timeout-polled puts so a stopped
consumer retires the producer, an END sentinel that also must not block,
and BaseException forwarding so a dead producer surfaces its error instead
of hanging the consumer's ``q.get`` forever. Used by the trainer's batch
stream and the audio decode pipeline; keep new pipelines on this helper
rather than hand-rolling a third copy.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_END = object()


class _ProducerError:
    """Wrapper distinguishing a producer FAILURE from an iterable that
    legitimately yields exception objects as data."""

    __slots__ = ("exc",)

    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_iter(iterable: Iterable, depth: int = 2) -> Iterator:
    """Yield from ``iterable`` with a background producer thread.

    Closing the generator (GeneratorExit — e.g. a train loop breaking at
    ``steps``) unblocks and retires the producer; an exception raised by the
    producer is re-raised in the consumer. ``depth`` is clamped to ≥ 1
    (queue.Queue(0) would mean UNBOUNDED and race the producer through the
    whole dataset into RAM)."""
    q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not _put(item):
                    return
        except BaseException as e:
            _put(_ProducerError(e))
            return
        _put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, _ProducerError):
                raise item.exc
            yield item
        t.join()
    finally:
        stop.set()
