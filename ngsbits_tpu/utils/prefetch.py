"""Background prefetch of an iterator (host pipeline parallelism).

Behavioral reference: SeqPurge's read→analyze→write thread pipeline over a
ring of prefetched blocks (ThreadCoordinator.cpp:39-54, block_prefetch).
TPU-native shape: one decode thread fills a bounded queue of ready batches
while the main thread runs device compute — input decode and TPU execution
overlap instead of alternating.
"""

from __future__ import annotations

import queue
import threading

_SENTINEL = object()


def prefetch(iterable, depth: int = 2):
    """Yield items of `iterable`, decoded ahead in a background thread.

    Exceptions raised by the producer are re-raised at the consumption
    point; the thread is a daemon so abandoning the generator cannot hang
    interpreter shutdown.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    error: list = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as exc:  # noqa: BLE001 — forwarded to consumer
            error.append(exc)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if error:
                raise error[0]
            return
        yield item


def prefetch_paired(it1, it2, depth: int = 2):
    """Prefetch two iterators in lockstep pairs (R1/R2 FASTQ streams)."""
    def pairs():
        s1, s2 = iter(it1), iter(it2)
        while True:
            a = next(s1, _SENTINEL)
            b = next(s2, _SENTINEL)
            if a is _SENTINEL and b is _SENTINEL:
                return
            yield (None if a is _SENTINEL else a,
                   None if b is _SENTINEL else b)
    return prefetch(pairs(), depth)
