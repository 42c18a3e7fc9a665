"""Host->device prefetch: double-buffered asynchronous feeding.

Replaces the reference's synchronous ``num_workers=0`` host loop
(dataloader.py:17): a background thread stages the next batches onto the
device (optionally batch-sharded over a mesh) while the current step
computes, hiding host-side slicing and PCIe/ICI transfer latency.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax


def prefetch_to_device(
    iterator: Iterable,
    depth: int = 2,
    sharding=None,
    place_fn=None,
) -> Iterator:
    """Yield device-resident batches, ``depth`` transfers in flight.

    ``place_fn`` overrides the placement (e.g. multi-host global-batch
    assembly via jax.make_array_from_process_local_data).

    If the consumer abandons the generator mid-epoch (a failing train
    step, KeyboardInterrupt, a retry loop), the generator's close/GC
    path sets a stop flag that the producer's bounded ``put`` polls, so
    the background thread exits and its queued device batches are
    released instead of staying pinned for the life of the process.
    """

    def place(batch):
        if place_fn is not None:
            return place_fn(batch)
        if sharding is not None:
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree.map(jax.device_put, batch)

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []
    stop = threading.Event()

    def put(item) -> bool:
        """Bounded put that gives up when the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not put(place(batch)):
                    return
        except Exception as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer done or abandoned: release the producer and drop any
        # staged batches so their device buffers can be freed
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
