"""Offline texture metrics over saved render/real image pairs.

Counterpart of reference compute_texture_metric.py: walks an images directory
of `*_raw_img.png` / `*_re_img.png` / `*_re_sil.png` triples, computes masked
PSNR / SSIM / LPIPS / L1 / L2 and prints the means.  Large renders get a
center crop to 224 (reference :37-39).

Usage: python compute_texture_metric.py --image_path <dir> [--center_crop]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def center_crop(img: np.ndarray, size: int = 224) -> np.ndarray:
    h, w = img.shape[:2]
    y0 = (h - size) // 2
    x0 = (w - size) // 2
    return img[y0 : y0 + size, x0 : x0 + size]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_path", required=True)
    parser.add_argument("--center_crop", action="store_true")
    args = parser.parse_args()

    import jax.numpy as jnp

    from hifihr_tpu.data.freihand import _load_image
    from hifihr_tpu.losses.lpips import LPIPS
    from hifihr_tpu.training.metrics import texture_metrics

    lpips_fn = LPIPS()
    if not lpips_fn.pretrained:
        print("WARNING: assets/lpips_alex.npz absent; LPIPS uses random features")

    names = sorted(
        f[: -len("_raw_img.png")]
        for f in os.listdir(args.image_path)
        if f.endswith("_raw_img.png")
    )
    acc = {k: [] for k in ("psnr", "ssim", "l1", "l2", "lpips")}
    for name in names:
        raw = _load_image(os.path.join(args.image_path, f"{name}_raw_img.png"))
        re = _load_image(os.path.join(args.image_path, f"{name}_re_img.png"))
        sil = _load_image(os.path.join(args.image_path, f"{name}_re_sil.png"))
        if sil.ndim == 3:
            sil = sil[..., 0]
        if args.center_crop:
            raw, re, sil = center_crop(raw), center_crop(re), center_crop(sil)
        m = texture_metrics(
            jnp.asarray(re[None]), jnp.asarray(sil[None, ..., None]),
            jnp.asarray(raw[None]),
        )
        mask = (sil > 0)[None, ..., None]
        d = lpips_fn(
            jnp.asarray((re[None] * mask) * 2 - 1), jnp.asarray((raw[None] * mask) * 2 - 1)
        )
        for k in ("psnr", "ssim", "l1", "l2"):
            acc[k].append(float(m[k]))
        acc["lpips"].append(float(d[0]))

    for k, v in acc.items():
        print(f"{k}: {np.mean(v):.5f} (n={len(v)})")


if __name__ == "__main__":
    main()
