"""Add a UV atlas + UV-space appearance PCA to the derived NIMBLE asset.

The reference's NIMBLE carries PCA UV diffuse/normal/specular maps rendered
through textured Meshes (models_res_nimble.py:132-142).  The licensed release
is unavailable here, so this derives a placeholder UV parameterization
(cylindrical chart around the finger axis, seam on the -x side) and a smooth
UV-space texture PCA for the 5990-vert derived mesh.  Maps are stored low-res
(mean 64^2, basis 32^2) and bilinearly upsampled by the layer to its render
resolution — converting the real NIMBLE release into the same keys upgrades
fidelity with no code change.

Usage: python tools/make_nimble_uv.py [asset_npz]
"""

from __future__ import annotations

import sys

import numpy as np

MEAN_RES = 64
BASIS_RES = 32
N_TEX = 10


def cylindrical_uv_np(verts: np.ndarray, axis: int = 1) -> np.ndarray:
    other = [a for a in range(3) if a != axis]
    x, z, h = verts[:, other[0]], verts[:, other[1]], verts[:, axis]
    u = np.arctan2(z, x) / (2 * np.pi) + 0.5
    v = (h - h.min()) / max(h.max() - h.min(), 1e-8)
    return np.stack([u, v], axis=-1).astype(np.float32)


def smooth_field(res: int, channels: int, n: int, seed: int, amp: float) -> np.ndarray:
    """(res, res, channels, n) smooth random fields from low-freq cosines."""
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                         indexing="ij")
    out = np.zeros((res, res, channels, n), np.float32)
    for i in range(n):
        for c in range(channels):
            fx, fy = rng.uniform(1, 4, 2) * 2 * np.pi
            ph = rng.uniform(0, 2 * np.pi, 2)
            out[..., c, i] = np.cos(xx * fx + ph[0]) * np.cos(yy * fy + ph[1])
    return out * amp


def main(path: str = "hifihr_tpu/assets/nimble_placeholder.npz"):
    data = dict(np.load(path))
    verts = data["v_template"]
    data["vert_uv"] = cylindrical_uv_np(verts)

    # skin-tone mean with smooth variation (matches the per-vertex mean's
    # statistics so existing loss magnitudes stay comparable)
    base = np.asarray([0.78, 0.57, 0.45], np.float32)
    var = smooth_field(MEAN_RES, 3, 1, seed=7, amp=0.06)[..., 0]
    data["tex_mean_uv"] = np.clip(base[None, None] + var, 0, 1).astype(np.float32)
    data["tex_basis_uv"] = smooth_field(
        BASIS_RES, 3, N_TEX, seed=11, amp=0.08
    ).astype(np.float32)

    np.savez_compressed(path, **data)
    print(f"updated {path}: vert_uv {data['vert_uv'].shape}, "
          f"tex_mean_uv {data['tex_mean_uv'].shape}, "
          f"tex_basis_uv {data['tex_basis_uv'].shape}")


if __name__ == "__main__":
    main(*sys.argv[1:])
