"""Segmentation-map -> binary hand mask for FreiHAND evaluation.

Counterpart of reference data/preprocess_eval_mask.py: walks an eval segmap
directory, thresholds the hand label to a {0, 255} mask and writes pngs the
loader's `masks` query can consume.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--segmap_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--threshold", type=int, default=0,
                        help="labels > threshold become hand")
    args = parser.parse_args()

    from PIL import Image

    os.makedirs(args.out_dir, exist_ok=True)
    names = sorted(f for f in os.listdir(args.segmap_dir) if f.endswith((".png", ".jpg")))
    for name in names:
        seg = np.asarray(Image.open(os.path.join(args.segmap_dir, name)))
        if seg.ndim == 3:
            seg = seg[..., 0]
        mask = ((seg > args.threshold).astype(np.uint8)) * 255
        Image.fromarray(mask).save(os.path.join(args.out_dir, name))
    print(f"wrote {len(names)} masks to {args.out_dir}")


if __name__ == "__main__":
    main()
