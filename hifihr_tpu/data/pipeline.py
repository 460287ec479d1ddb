"""Host->device input pipeline: sharded transfer with prefetch.

Keeps the TPU fed (SURVEY.md hard part #5): while step N executes, batch N+1
is collated on the host thread pool and transferred. jax device transfers are
async, so a depth-2 buffer suffices to overlap H2D with compute.
"""

from __future__ import annotations

import collections
import concurrent.futures
from typing import Iterable, Iterator

import jax.numpy as jnp

from hifihr_tpu.parallel.mesh import shard_batch


def _to_device(batch, mesh):
    arrs = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, str)}
    out = shard_batch(arrs, mesh)
    out["dataset"] = batch.get("dataset", "FreiHand")
    return out


def prefetch_to_device(loader: Iterable[dict], mesh, depth: int = 3,
                       transfer_workers: int = 2) -> Iterator[dict]:
    """Yields device-resident sharded batches, loading `depth` ahead.

    Host-side batch assembly is serialized behind a lock (the loader iterator
    is not thread-safe), but the device transfers themselves run on
    `transfer_workers` threads so two H2D copies can be in flight at once —
    on a tunneled backend the transfer is network I/O and releases the GIL.
    """
    import itertools
    import threading

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=transfer_workers)
    queue: collections.deque = collections.deque()
    it = iter(loader)
    lock = threading.Lock()
    counter = itertools.count()

    def fetch():
        # ticket is taken under the same lock as next(it), so ticket order ==
        # iterator order even when two workers race; the consumer reorders by
        # ticket so eval predictions stay aligned with GT order.
        with lock:
            try:
                batch = next(it)
            except StopIteration:
                return None, None
            ticket = next(counter)
        return ticket, _to_device(batch, mesh)

    for _ in range(depth):
        queue.append(pool.submit(fetch))
    expected = 0
    pending: dict = {}
    stop = False
    while True:
        if expected in pending:
            batch = pending.pop(expected)
            expected += 1
            if not stop:
                queue.append(pool.submit(fetch))
            yield batch
            continue
        if not queue:
            break
        ticket, batch = queue.popleft().result()
        if batch is None:
            stop = True
            continue
        pending[ticket] = batch
    pool.shutdown(wait=False)
