"""Convert the openpose hand_pose_model.pth into assets/openpose_hand.npz.

The reference ships caffe-converted torch weights for its CPM hand detector
(utils/openpose_detector, loaded in src/hand.py:17-21).  This maps that
state_dict onto the flax HandposeCPM parameter names (conv OIHW -> HWIO).

Usage: python tools/convert_openpose.py hand_pose_model.pth \
           hifihr_tpu/assets/openpose_hand.npz
"""

from __future__ import annotations

import sys

import numpy as np
import torch


def main(src: str, dst: str):
    sd = torch.load(src, map_location="cpu", weights_only=True)
    # strip any module prefixes like 'model1_0.conv1_1.weight'
    flat = {}
    for k, v in sd.items():
        name = k.split(".")[-2] if k.count(".") >= 2 else k.rsplit(".", 1)[0]
        kind = "kernel" if k.endswith("weight") else "bias"
        arr = v.numpy()
        if kind == "kernel":
            arr = np.transpose(arr, (2, 3, 1, 0))
        flat[f"{name}_{kind}"] = arr
    np.savez_compressed(dst, **flat)
    print(f"wrote {dst} ({len(flat)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
