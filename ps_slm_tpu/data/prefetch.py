"""Background batch prefetching.

The reference overlapped host fbank with training via DataLoader worker
processes (num_workers=4, finetune_deepspeed.py:192-197).  Here the host
work is only IO + tokenization (fbank runs on device), so a single prefetch
thread with a bounded queue suffices to hide it behind the device step.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Wrap an iterable so items are produced by a daemon thread.

    Exceptions in the producer are re-raised at the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    err = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - reraised below
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item


def device_prefetch(
    iterable: Iterable, place, depth: int = 2
) -> Iterator:
    """Prefetch with host->device placement inside the producer thread.

    ``place(host_batch) -> device_batch`` runs off the consumer thread, so
    the H2D transfer of batch N+1 overlaps the device step on batch N (the
    double-buffered ``device_put`` of SURVEY.md §7 step 11 — on relay-style
    backends the transfer is the per-step host cost that most needs hiding).

    Yields ``(host_batch, device_batch)`` pairs; host-only fields (keys,
    targets, audio seconds) stay readable on the host side.
    """
    return prefetch(
        ((batch, place(batch)) for batch in iterable), depth=depth
    )
