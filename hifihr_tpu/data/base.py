"""Dataset protocol + host-side batching.

The reference wraps torch DataLoaders with worker processes and a round-robin
ConcatDataloader (utils/concat_dataloader.py:9-37).  Here datasets are plain
query-driven samplers returning numpy dicts; BatchLoader does
shuffle/collate/drop-last with static batch shapes (XLA requirement), and
ConcatLoader reproduces the round-robin multi-dataset schedule that drives the
weak_rhd_* recipes.  Device transfer happens once per step in the train loop
(jax.device_put with a batch sharding), not per-tensor like the reference's
per-field `.cuda()` calls (traineval_util.py:26-282).
"""

from __future__ import annotations

import itertools
from typing import Iterator, Protocol, Sequence

import numpy as np


class HandDataset(Protocol):
    name: str

    def __len__(self) -> int: ...

    def get_sample(self, idx: int) -> dict: ...


def collate(samples: Sequence[dict]) -> dict:
    """Stack a list of numpy sample dicts into one batch dict."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = vals
    return out


class Subset:
    """First-k view of any HandDataset — the reference's controlled-size
    experiments wrap every pose dataset this way (data/dataset.py:97-106)."""

    def __init__(self, dataset, size: int):
        n = len(dataset)
        if n < size:
            import warnings

            warnings.warn(f"limit size {size} > dataset size {n}; using full dataset")
        self.dataset = dataset
        self.size = min(int(size), n)
        self.name = getattr(dataset, "name", "unknown")

    def __len__(self) -> int:
        return self.size

    def get_sample(self, idx: int) -> dict:
        return self.dataset.get_sample(idx)


class BatchLoader:
    """Shuffling, drop-last batch iterator with a deterministic seed."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        rng = np.random.RandomState(self.seed + self.epoch + 12345)
        for start in range(0, n - self.batch_size + 1 if self.drop_last else n,
                           self.batch_size):
            idxs = order[start : start + self.batch_size]
            samples = []
            for i in idxs:
                # corrupt-sample fault tolerance: substitute a random sample
                # (reference data/dataset.py:1391-1399) but LOG it instead of
                # silently masking data bugs
                try:
                    samples.append(self.dataset.get_sample(int(i)))
                except Exception as exc:  # noqa: BLE001
                    import logging

                    logging.warning("sample %d failed (%s); substituting", i, exc)
                    samples.append(self.dataset.get_sample(int(rng.randint(n))))
            batch = collate(samples)
            batch["dataset"] = getattr(self.dataset, "name", "unknown")
            yield batch


class ConcatLoader:
    """Round-robin over several loaders (reference ConcatDataloader :9-37).

    len = sum of member lengths; each __next__ cycles to the next loader, so
    a batch is always single-dataset (tagged with its name) and datasets mix
    at the schedule level.
    """

    def __init__(self, loaders: Sequence[BatchLoader]):
        self.loaders = list(loaders)

    def __len__(self) -> int:
        return sum(len(l) for l in self.loaders)

    def __iter__(self) -> Iterator[dict]:
        iters = [iter(l) for l in self.loaders]
        cycle = itertools.cycle(range(len(iters)))
        remaining = len(self)
        while remaining > 0:
            i = next(cycle)
            try:
                yield next(iters[i])
                remaining -= 1
            except StopIteration:
                iters[i] = iter(self.loaders[i])
