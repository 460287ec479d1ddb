"""Offline converter: MANO pickle (contains chumpy objects) -> plain .npz.

The reference loads MANO through chumpy at model-construction time
(reference: utils/mano/webuser/smpl_handpca_wrapper_HAND_only.py:22-67,
utils/my_mano.py:31-33).  On TPU we want zero pickle/chumpy at runtime, so
this tool runs once, offline, and emits a flat npz consumed by
`hifihr_tpu.assets.load_mano_model`.

chumpy does not need to be installed: we unpickle with a stub class that
captures object state.  MANO's `shapedirs` is stored as a chumpy "select"
op — an underlying (778,3,45-ish) array `a.x`, flat indices `idxs` and a
`preferred_shape` — which we materialise to a dense ndarray here.

Usage:
    python -m hifihr_tpu.assets.convert_mano /path/to/MANO_RIGHT.pkl \
        hifihr_tpu/assets/mano_right.npz
"""

from __future__ import annotations

import pickle
import sys

import numpy as np


class _ChStub:
    """Captures the state of any pickled chumpy object without chumpy."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChStub
        return super().find_class(module, name)


def _densify(obj) -> np.ndarray:
    """Materialise a raw ndarray / scipy sparse / chumpy stub to dense float."""
    if isinstance(obj, np.ndarray):
        return obj
    if hasattr(obj, "toarray"):  # scipy sparse
        return np.asarray(obj.toarray())
    if isinstance(obj, _ChStub):
        d = obj.__dict__
        if "x" in d:  # chumpy.Ch leaf array
            return np.asarray(d["x"])
        if "a" in d and "idxs" in d:  # chumpy select/reshape op
            base = _densify(d["a"]).ravel()
            out = base[np.asarray(d["idxs"], dtype=np.int64)]
            shape = d.get("preferred_shape")
            return out.reshape(shape) if shape is not None else out
        raise ValueError(f"Unsupported chumpy object with keys {sorted(d)}")
    raise TypeError(f"Cannot densify {type(obj)}")


def convert(pkl_path: str, npz_path: str) -> dict:
    with open(pkl_path, "rb") as f:
        dd = _StubUnpickler(f, encoding="latin1").load()

    kintree = np.asarray(dd["kintree_table"], dtype=np.int64)  # (2, 16)
    parents = kintree[0].copy()
    parents[0] = -1  # root sentinel (stored value is 2^32-1 style garbage)

    out = {
        "v_template": _densify(dd["v_template"]).astype(np.float32),  # (778,3)
        "shapedirs": _densify(dd["shapedirs"]).astype(np.float32),  # (778,3,10)
        "posedirs": _densify(dd["posedirs"]).astype(np.float32),  # (778,3,135)
        "J_regressor": _densify(dd["J_regressor"]).astype(np.float32),  # (16,778)
        "lbs_weights": _densify(dd["weights"]).astype(np.float32),  # (778,16)
        "hands_components": _densify(dd["hands_components"]).astype(np.float32),  # (45,45)
        "hands_mean": _densify(dd["hands_mean"]).astype(np.float32),  # (45,)
        "faces": np.asarray(dd["f"], dtype=np.int32),  # (1538,3)
        "parents": parents.astype(np.int32),  # (16,)
    }
    np.savez_compressed(npz_path, **out)
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/MANO_RIGHT.pkl"
    dst = sys.argv[2] if len(sys.argv) > 2 else "hifihr_tpu/assets/mano_right.npz"
    arrs = convert(src, dst)
    for k, v in arrs.items():
        print(f"{k}: {v.shape} {v.dtype}")
    print(f"wrote {dst}")
