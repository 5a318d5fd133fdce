"""Background host->device batch prefetch.

The trainers' per-step host work (index/reparam batch assembly,
normalization, padding, device_put) runs serially with the device step
unless overlapped.  `prefetch` pulls a wrapped iterator on a daemon
thread into a bounded queue so batch i+1's host pipeline runs while the
device executes step i.  device_put is thread-safe and async; in
multi-host runs the thread preserves iteration order, so collective
array assembly (`make_array_from_process_local_data`) stays in lockstep
across processes.

The reference gets the same overlap from torch DataLoader workers
(train_latent.py uses num_workers>0 loaders); this is the dependency-
free TPU-side equivalent.
"""

from __future__ import annotations

import queue
import threading

_SENTINEL = object()


def prefetch(iterator, size=2):
    """Yield from `iterator`, computed `size` elements ahead on a daemon
    thread.  Exceptions in the producer re-raise at the consumer."""
    q = queue.Queue(maxsize=size)
    err = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
