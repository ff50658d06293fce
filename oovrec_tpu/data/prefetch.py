"""Background batch prefetching.

The reference relies on torch DataLoader workers (`config['worker']`);
here a single daemon thread assembles host batches ahead of the device
(host assembly is NumPy-vectorized and cheap, so one thread suffices —
the goal is overlap, not parallel assembly). Bounded queue keeps memory
flat; iteration order and RNG streams are unchanged because the SAME
underlying batcher iterator runs, just ahead of time.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator


class PrefetchIterator:
    _SENTINEL = object()

    def __init__(self, iterable, depth: int = 2):
        self._iterable = iterable
        self._depth = depth

    def __len__(self):
        return len(self._iterable)

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self._depth)
        err = []

        def worker():
            try:
                for item in self._iterable:
                    q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                if err:
                    raise err[0]
                return
            yield item


def maybe_prefetch(loader, config):
    """Wrap a train loader in a prefetcher when `worker` > 0."""
    workers = int(config.get("worker", 0) or 0)
    if workers > 0:
        return PrefetchIterator(loader, depth=max(2, workers))
    return loader
