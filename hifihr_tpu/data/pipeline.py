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


def prefetch_to_device(loader: Iterable[dict], mesh, depth: int = 2) -> Iterator[dict]:
    """Yields device-resident sharded batches, loading `depth` ahead."""
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    queue: collections.deque = collections.deque()
    it = iter(loader)

    def fetch():
        try:
            return _to_device(next(it), mesh)
        except StopIteration:
            return None

    for _ in range(depth):
        queue.append(pool.submit(fetch))
    while queue:
        batch = queue.popleft().result()
        if batch is None:
            break
        queue.append(pool.submit(fetch))
        yield batch
    pool.shutdown(wait=False)
