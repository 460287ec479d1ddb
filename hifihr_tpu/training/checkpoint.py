"""Checkpoint save/restore with selective-submodule semantics (orbax).

The reference saves per-submodule state_dicts + optimizer/scheduler/epoch and
restores module-by-module with hasattr/key-intersection so checkpoints port
across model variants (utils/train_utils.py:14-202).  Here: orbax pytree
checkpoints of {params, batch_stats, opt_state, epoch}; `restore` intersects
the stored params tree with the target tree per top-level module, so a
checkpoint from e.g. a render=False run can warm-start a render=True model
(missing subtrees keep their fresh init).  `save_mode` mirrors the
reference ('only_latest' vs 'separately' + every-20-epoch keep).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _intersect(stored: dict, target: dict) -> dict:
    """Recursively take stored values where the structure matches target."""
    out = {}
    for k, v in target.items():
        if k in stored:
            sv = stored[k]
            if isinstance(v, dict) and isinstance(sv, dict):
                out[k] = _intersect(sv, v)
            elif not isinstance(v, dict) and not isinstance(sv, dict) and (
                getattr(sv, "shape", None) == getattr(v, "shape", None)
            ):
                out[k] = sv
            else:
                out[k] = v
        else:
            out[k] = v
    return out


class CheckpointManager:
    def __init__(self, directory: str, save_mode: str = "separately"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_mode = save_mode
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, tag) -> str:
        return os.path.join(self.directory, f"texturehand_{tag}")

    def save(self, state, epoch: int) -> str:
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats or {},
            "opt_state": state.opt_state,
            "epoch": np.int64(epoch),
        }
        if self.save_mode == "only_latest":
            tags = ["latest"]
        else:
            tags = [str(epoch), "latest"]
        for tag in tags:
            path = self._path(tag)
            self._ckpt.save(path, tree, force=True)
        # prune non-snapshot epochs (keep every 20th, reference
        # train_utils.py:185-199)
        if self.save_mode == "separately":
            for name in os.listdir(self.directory):
                if not name.startswith("texturehand_") or name.endswith("latest"):
                    continue
                try:
                    e = int(name.split("_")[-1])
                except ValueError:
                    continue
                if e != epoch and e % 20 != 0:
                    import shutil

                    shutil.rmtree(os.path.join(self.directory, name), ignore_errors=True)
        return self._path(tags[0])

    def restore_submodules(self, state, prefixes: tuple, tag="latest"):
        """Load ONLY parameters whose '/'-joined path starts with a prefix
        (e.g. ('rgb2hm',) or ('hand_encoder/tex',)) — the reference's
        module-targeted warm starts (utils/train_utils.py:96-111:
        pretrain_texture_model tex_reg load, pretrain_rgb2hm load)."""
        from flax import traverse_util

        stored = self._ckpt.restore(self._path(tag))

        def merge(target: dict, source: dict) -> dict:
            flat_t = traverse_util.flatten_dict(target)
            flat_s = traverse_util.flatten_dict(source)
            n = 0
            for k in flat_t:
                ks = "/".join(map(str, k))
                if any(ks.startswith(p) for p in prefixes) and k in flat_s and (
                    getattr(flat_s[k], "shape", None) == getattr(flat_t[k], "shape", None)
                ):
                    flat_t[k] = flat_s[k]
                    n += 1
            return traverse_util.unflatten_dict(flat_t) if n else target

        params = merge(dict(state.params), stored.get("params", {}))
        batch_stats = state.batch_stats or {}
        if batch_stats:
            batch_stats = merge(dict(batch_stats), stored.get("batch_stats", {}))
        return state.replace(params=params, batch_stats=batch_stats)

    def restore(self, state, tag="latest"):
        """Returns (state, epoch). Selective per-submodule restore."""
        path = self._path(tag)
        stored = self._ckpt.restore(path)
        params = _intersect(stored["params"], jax.tree_util.tree_map(lambda x: x, state.params))
        batch_stats = _intersect(stored.get("batch_stats", {}), state.batch_stats or {})
        try:
            state = state.replace(params=params, batch_stats=batch_stats,
                                  opt_state=jax.tree_util.tree_unflatten(
                                      jax.tree_util.tree_structure(state.opt_state),
                                      jax.tree_util.tree_leaves(stored["opt_state"]),
                                  ))
        except Exception:
            # optimizer state incompatible (e.g. different submodules) —
            # restore weights only, like the reference's partial loads
            state = state.replace(params=params, batch_stats=batch_stats)
        return state, int(stored.get("epoch", 0))
