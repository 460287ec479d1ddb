"""Host->device input pipeline: packed single-buffer transfer with prefetch.

Keeps the TPU fed (SURVEY.md hard part #5).  Two measured facts about a
remote/tunneled device shape this design: (1) the H2D link runs ~29 MB/s, so
bytes are the budget; (2) EVERY device_put pays a fixed round trip (~30 ms),
so a batch dict of ~9 arrays costs ~270 ms in latency alone.  Hence:

  * the whole batch packs into ONE (B, row_bytes) uint8 buffer host-side
    (per-sample rows, so the leading dim still shards over the mesh),
  * binary {0,1} uint8 masks bit-pack 8:1 (np.packbits),
  * one device_put moves the buffer; a cached jitted unpack (static layout
    spec) slices/bitcasts/reshapes it back into the batch dict on device,
  * uint8 images normalise on device inside the train step (4x fewer bytes
    than float32 on the wire).
"""

from __future__ import annotations

import collections
import concurrent.futures
import functools
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from hifihr_tpu.parallel.mesh import batch_sharding, shard_batch

# keys holding binary {0,1} uint8 masks -> bit-packed 8:1 on the wire
_BITPACK_KEYS = ("segms_gt",)


def pack_batch(arrs: dict) -> tuple[np.ndarray, tuple]:
    """Pack a dict of (B, ...) numpy arrays into one (B, S) uint8 buffer.

    Returns (buffer, spec); spec is a hashable layout description consumed by
    `unpack_batch` on device.  int64 fields are narrowed to int32 (jax x64 is
    disabled anyway).  Binary u8 masks are bit-packed MSB-first."""
    fields = []
    cols = []
    off = 0
    b = None
    for key in sorted(arrs):
        a = np.asarray(arrs[key])
        if a.dtype == np.int64:
            a = a.astype(np.int32)
        if a.dtype == np.float64:
            a = a.astype(np.float32)
        b = a.shape[0] if b is None else b
        assert a.shape[0] == b, (key, a.shape, b)
        shape = a.shape[1:]
        if key in _BITPACK_KEYS and a.dtype == np.uint8:
            col = np.packbits(a.reshape(b, -1), axis=1)
            kind = "bits"
        else:
            col = np.ascontiguousarray(a).reshape(b, -1).view(np.uint8)
            kind = "raw"
        fields.append((key, str(a.dtype), shape, off, col.shape[1], kind))
        cols.append(col)
        off += col.shape[1]
    return np.concatenate(cols, axis=1), tuple(fields)


@functools.lru_cache(maxsize=32)
def _unpack_fn(spec: tuple, sharding=None):
    """Jitted device-side unpack for one packed layout."""

    def unpack(buf):
        b = buf.shape[0]
        out = {}
        for key, dt, shape, off, nbytes, kind in spec:
            seg = buf[:, off : off + nbytes]
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            if kind == "bits":
                shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB-first
                bits = (seg[:, :, None] >> shifts) & jnp.uint8(1)
                out[key] = bits.reshape(b, -1)[:, :n].reshape((b,) + shape)
            elif dt == "uint8":
                out[key] = seg.reshape((b,) + shape)
            else:
                dtype = jnp.dtype(dt)
                item = dtype.itemsize
                arr = jax.lax.bitcast_convert_type(
                    seg.reshape(b, nbytes // item, item), dtype
                )
                out[key] = arr.reshape((b,) + shape)
        return out

    kwargs = {"out_shardings": sharding} if sharding is not None else {}
    return jax.jit(unpack, **kwargs)


def _to_device(batch, mesh):
    arrs = {k: v for k, v in batch.items() if not isinstance(v, str)}
    packed, spec = pack_batch(arrs)
    sharding = batch_sharding(mesh)
    buf = jax.device_put(packed, sharding)
    out = dict(_unpack_fn(spec, sharding)(buf))
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
