"""Generate an on-disk FreiHAND-format fixture dataset.

Writes real JPEG images + the FreiHAND annotation json files so the REAL
loader path (JPEG decode -> affine warp -> collate -> H2D) can be measured
end-to-end without the multi-GB FreiHAND download (reference layout:
data/dataset.py:1402-1610 — {split}_K/scale/xyz/verts.json, training/rgb,
training/mask, outputs/freihand-train_openpose_keypoints.json).

Geometry is self-consistent: MANO-layer joints/verts, a perspective K, and
j2d = proj(joints, K); images are smooth low-frequency noise (JPEG entropy
comparable to natural photos) with a bright blob at the hand location and a
matching binary mask.

Usage: python tools/make_freihand_fixture.py [out_dir] [n_images]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_fixture(out_dir: str, n: int = 2048, image_size: int = 224,
                 seed: int = 0, quality: int = 92) -> str:
    from PIL import Image

    from hifihr_tpu.data.synthetic import SyntheticHandDataset

    marker = os.path.join(out_dir, ".fixture_complete")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == {"n": n, "image_size": image_size, "seed": seed}:
                return out_dir

    ds = SyntheticHandDataset(size=n, image_size=image_size, seed=seed)
    rgb_dir = os.path.join(out_dir, "training", "rgb")
    mask_dir = os.path.join(out_dir, "training", "mask")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "outputs"), exist_ok=True)

    Ks, scales, xyzs, verts, open2dj = [], [], [], [], []
    rng = np.random.RandomState(seed + 7)
    s = image_size
    for i in range(n):
        root = np.asarray([0.0, 0.0, ds.root_z[i]], np.float32)
        joints_cam = ds.joints[i] + root
        uvw = joints_cam @ ds.K.T
        j2d = uvw[:, :2] / uvw[:, 2:3]

        # smooth background (low-res noise upsampled) + blob at the hand
        low = (rng.rand(14, 14, 3) * 255).astype(np.uint8)
        img = np.asarray(
            Image.fromarray(low).resize((s, s), Image.BILINEAR), np.float32
        )
        cx, cy = np.clip(j2d.mean(0).astype(int), 16, s - 16)
        img[cy - 16 : cy + 16, cx - 16 : cx + 16] = (
            img[cy - 16 : cy + 16, cx - 16 : cx + 16] * 0.3 + 0.7 * 230
        )
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(rgb_dir, "%08d.jpg" % i), quality=quality
        )
        mask = np.zeros((s, s), np.uint8)
        mask[cy - 16 : cy + 16, cx - 16 : cx + 16] = 255
        Image.fromarray(mask).save(
            os.path.join(mask_dir, "%08d.jpg" % i), quality=quality
        )

        Ks.append(np.asarray(ds.K, np.float64).tolist())
        bone = float(np.linalg.norm(ds.joints[i][9] - ds.joints[i][10]))
        scales.append(bone)
        xyzs.append(joints_cam.astype(np.float64).tolist())
        verts.append((ds.verts[i] + root).astype(np.float64).tolist())
        open2dj.append([j2d.astype(np.float64).tolist(),
                        np.ones((21, 1)).tolist()])

    for name, data in (("training_K", Ks), ("training_scale", scales),
                       ("training_xyz", xyzs), ("training_verts", verts)):
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(data, f)
    with open(os.path.join(
            out_dir, "outputs", "freihand-train_openpose_keypoints.json"), "w") as f:
        json.dump(open2dj, f)
    with open(marker, "w") as f:
        json.dump({"n": n, "image_size": image_size, "seed": seed}, f)
    return out_dir


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-only work
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hifihr_fixture"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    make_fixture(out, n)
    print(f"fixture at {out}: {n} images")
