"""One-time decoded-uint8 snapshot cache for image directories.

The reference re-decodes the same 130 240 training JPEGs from disk on EVERY
epoch (data/dataset.py loads per __getitem__ through PIL); on a host with few
cores libjpeg dominates the input pipeline long before the accelerator is
busy.  This module memory-maps one flat uint8 file per (directory, shape)
and fills it lazily the first time each frame is decoded, so from epoch 2 on
a "decode" is a page-cache memcpy with zero JPEG work — the input pipeline
then measures the framework (warp + collate + H2D), not libjpeg.

The cache is exact: it stores the decoder's own uint8 output, so cached and
uncached epochs are bit-identical.  Random augmentation (the affine warp and
its K update) still runs per epoch downstream of the cache.

Thread-safe under the BatchLoader's worker pool: concurrent first-touch
writes of the same index store identical bytes (idempotent), and the filled
flag is set only after the pixel write.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np


class DecodedFrameCache:
    """Lazy mmap snapshot of `n` same-shape uint8 frames.

    Parameters
    ----------
    cache_dir: directory for the backing files (created if missing).
    key:       logical identity of the source (e.g. the image directory
               path); hashed into the file name.
    n:         number of frames.
    shape:     per-frame shape, e.g. (224, 224, 3) or (224, 224).
    """

    @staticmethod
    def _base(cache_dir: str, key: str, n: int) -> str:
        tag = hashlib.sha1(f"{key}|{n}".encode()).hexdigest()[:16]
        return os.path.join(cache_dir, f"frames_{tag}")

    @classmethod
    def lookup(cls, cache_dir: str, key: str, n: int):
        """Open an existing snapshot (shape from the sidecar meta) or None —
        lets a fresh process reuse a filled cache with zero decode work."""
        import json

        meta = cls._base(cache_dir, key, n) + ".json"
        if not os.path.exists(meta):
            return None
        with open(meta) as f:
            shape = tuple(json.load(f)["shape"])
        return cls(cache_dir, key, n, shape)

    def __init__(self, cache_dir: str, key: str, n: int, shape: tuple):
        import json

        os.makedirs(cache_dir, exist_ok=True)
        base = self._base(cache_dir, key, n)
        self.data_path = base + ".u8"
        self.filled_path = base + ".filled"
        meta_path = base + ".json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                if tuple(json.load(f)["shape"]) != tuple(shape):
                    # source shape changed: rebuild from scratch
                    for p in (self.data_path, self.filled_path, meta_path):
                        if os.path.exists(p):
                            os.remove(p)
        if not os.path.exists(meta_path):
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"key": key, "n": int(n),
                           "shape": [int(s) for s in shape]}, f)
            os.replace(tmp, meta_path)
        self.shape = (int(n), *map(int, shape))
        nbytes = int(np.prod(self.shape))
        for path, size in ((self.data_path, nbytes), (self.filled_path, n)):
            if not os.path.exists(path) or os.path.getsize(path) != size:
                # create-and-truncate atomically enough for our use: a partial
                # previous file is simply rebuilt (filled flags start zero)
                with open(path, "wb") as f:
                    f.truncate(size)
        self.data = np.memmap(self.data_path, dtype=np.uint8, mode="r+",
                              shape=self.shape)
        self.filled = np.memmap(self.filled_path, dtype=np.uint8, mode="r+",
                                shape=(int(n),))

    def get(self, idx: int, decode_fn) -> np.ndarray:
        """Return frame `idx`, decoding (and snapshotting) on first touch."""
        idx = int(idx)
        if self.filled[idx]:
            return np.asarray(self.data[idx])
        arr = np.ascontiguousarray(decode_fn(), dtype=np.uint8)
        if arr.shape != self.shape[1:]:
            # shape surprise (mixed-size source dir): serve uncached
            return arr
        self.data[idx] = arr
        self.filled[idx] = 1
        return arr

    @property
    def n_filled(self) -> int:
        return int(np.count_nonzero(self.filled))
