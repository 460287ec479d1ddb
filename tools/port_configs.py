"""Port the reference's full JSON config bank into configs/.

Reads every config under /root/reference/config (or --src), maps stale/renamed
values onto the validated Config schema (e.g. the dangling 'efficientnet'
encoder enum -> 'effb3', machine-specific absolute paths -> relative
placeholders) and writes configs/<Dataset>/<name>.json.  Every output is
round-tripped through Config.from_json so the whole bank is guaranteed to
load.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from hifihr_tpu.config import Config  # noqa: E402

ENCODER_FIX = {"efficientnet": "effb3", "hr18sv2": "hr18sv2"}
PATH_KEYS = {
    "freihand_base_path": "../freihand",
    "rhd_base_path": "../RHD/RHD_published_v2",
    "ho3d_base_path": "../HO3D_v2",
    "dart_base_path": "../",
}


def port_one(src_path: str, dst_path: str) -> bool:
    with open(src_path) as f:
        raw = json.load(f)

    out = {}
    for k, v in raw.items():
        if k == "pretrain":
            v = ENCODER_FIX.get(v, v)
        if k in PATH_KEYS and v:
            v = PATH_KEYS[k]
        if k in ("pretrain_model", "pretrain_texture_model", "pretrain_rgb2hm",
                 "pretrain_segmnet") and v:
            # machine-specific checkpoint paths -> leave as a documented slot
            v = None
        if k == "base_out_path":
            v = "output/" + os.path.splitext(os.path.basename(dst_path))[0]
        out[k] = v
    # the reference's self-sup configs list deprecated-loss names the port
    # renamed: map them
    if "losses" in out:
        renames = {"2dj": "open_2dj", "tex": "texture_self", "percep": "perceptual"}
        out["losses"] = [renames.get(l, l) for l in out["losses"]]

    try:
        Config.from_dict(out)
    except ValueError as exc:
        print(f"SKIP {src_path}: {exc}")
        return False
    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
    with open(dst_path, "w") as f:
        json.dump(out, f, indent=2)
    return True


def main(src_root: str = "/root/reference/config", dst_root: str = "configs"):
    n_ok = 0
    n_all = 0
    for dirpath, _, files in os.walk(src_root):
        rel = os.path.relpath(dirpath, src_root)
        for name in sorted(files):
            if not name.endswith(".json"):
                continue
            n_all += 1
            dst = os.path.join(dst_root, rel, name)
            if port_one(os.path.join(dirpath, name), dst):
                n_ok += 1
    print(f"ported {n_ok}/{n_all} configs into {dst_root}/")


if __name__ == "__main__":
    main(*sys.argv[1:])
