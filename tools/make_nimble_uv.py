"""Add a seam-aware per-finger UV atlas + full UV-space appearance PCA
(diffuse / normal / specular) to the derived NIMBLE asset.

The reference's NIMBLE appearance model is PCA UV maps for diffuse, normal
and specular, rendered through textured Meshes (models_res_nimble.py:132-142;
SURVEY §2.1 NIMBLE row).  The licensed release is unavailable here, so this
derives a placeholder with the same *structure*:

  * `face_uv` (F, 3, 2): per-FACE-CORNER atlas — 6 islands (palm + 5
    fingers) packed in a 3x2 tile grid.  Vertices are grouped by dominant
    LBS joint -> finger chain; each island is a cylindrical chart around the
    island's principal axis, with per-face angular unwrapping so faces that
    cross the wrap seam get duplicated texels (real-atlas seam semantics —
    possible because the renderer interpolates per-corner UVs, not
    per-vertex).
  * `vert_uv` (V, 2): first-corner fallback for per-vertex-UV consumers
    (OBJ export compatibility).
  * appearance PCA: `tex_mean_uv`/`tex_basis_uv` (diffuse),
    `normal_mean_uv`/`normal_basis_uv` (tangent-space, mean = flat +Z),
    `spec_mean_uv`/`spec_basis_uv` (scalar weight) — all driven by the same
    10 appearance coefficients, like NIMBLE's joint appearance latent.

Maps are stored low-res and bilinearly upsampled by the layer; converting
the real NIMBLE release into the same keys upgrades fidelity with no code
change.

Usage: python tools/make_nimble_uv.py [asset_npz]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEAN_RES = 64
BASIS_RES = 32
N_TEX = 10
MARGIN = 0.06  # island-interior margin (fraction of a tile)


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


def finger_groups(lbs_weights: np.ndarray, parents: np.ndarray) -> np.ndarray:
    """(V,) island id: 0 = palm, 1..5 = finger chains (children of root)."""
    n_j = len(parents)
    root_children = [j for j in range(n_j) if parents[j] == 0]
    chain_of = np.zeros(n_j, np.int32)
    for j in range(1, n_j):
        a = j
        while parents[a] != 0:
            a = parents[a]
        chain_of[j] = root_children.index(a) + 1
    dom = np.argmax(lbs_weights[:, :n_j], axis=1)
    return chain_of[dom]


def island_chart(verts: np.ndarray, faces_local: np.ndarray):
    """Cylindrical chart for one island: per-corner (u, v) with per-face
    angular unwrap.  Returns (corner_uv (Fl, 3, 2) in [0,1]^2 chart space)."""
    c = verts.mean(0)
    x = verts - c
    # principal axis via SVD
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    axis = vt[0]
    e1 = vt[1]
    e2 = np.cross(axis, e1)
    t = x @ axis
    ang = np.arctan2(x @ e2, x @ e1)  # [-pi, pi]
    u_vert = ang / (2 * np.pi) + 0.5  # [0, 1)
    v_vert = (t - t.min()) / max(t.max() - t.min(), 1e-8)

    cu = u_vert[faces_local]  # (Fl, 3)
    # unwrap faces crossing the 0/1 seam: lift low corners by +1
    span = cu.max(1) - cu.min(1)
    wrap = span > 0.5
    cu = np.where(wrap[:, None] & (cu < 0.5), cu + 1.0, cu)
    # normalize the (now possibly [0, ~1.5)) chart back to [0, 1]
    lo, hi = cu.min(), cu.max()
    cu = (cu - lo) / max(hi - lo, 1e-8)
    cv = v_vert[faces_local]
    return np.stack([cu, cv], axis=-1).astype(np.float32)


def build_atlas(verts: np.ndarray, faces: np.ndarray, groups: np.ndarray):
    """(face_uv (F, 3, 2), vert_uv (V, 2)): 6 islands in a 3x2 tile grid."""
    F = faces.shape[0]
    face_uv = np.zeros((F, 3, 2), np.float32)
    # each face belongs to the majority island of its corners
    fg = np.asarray([np.bincount(groups[f]).argmax() for f in faces])
    for g in range(6):
        fsel = np.nonzero(fg == g)[0]
        if len(fsel) == 0:
            continue
        vids = np.unique(faces[fsel].ravel())
        remap = np.full(verts.shape[0], -1, np.int64)
        remap[vids] = np.arange(len(vids))
        chart = island_chart(verts[vids], remap[faces[fsel]])
        tile_x, tile_y = g % 3, g // 3
        scale = 1.0 - 2.0 * MARGIN
        chart = MARGIN + chart * scale  # inset within the tile
        chart[..., 0] = (chart[..., 0] + tile_x) / 3.0
        chart[..., 1] = (chart[..., 1] + tile_y) / 2.0
        face_uv[fsel] = chart
    vert_uv = np.zeros((verts.shape[0], 2), np.float32)
    vert_uv[faces.ravel()] = face_uv.reshape(-1, 2)  # last-writer fallback
    return face_uv, vert_uv


def main(path: str = "hifihr_tpu/assets/nimble_placeholder.npz"):
    data = dict(np.load(path))
    verts = data["v_template"]
    faces = data["faces"].astype(np.int64)
    groups = finger_groups(data["lbs_weights"], data["parents"])
    face_uv, vert_uv = build_atlas(verts, faces, groups)
    data["face_uv"] = face_uv
    data["vert_uv"] = vert_uv

    # diffuse: skin-tone mean with smooth variation
    base = np.asarray([0.78, 0.57, 0.45], np.float32)
    var = smooth_field(MEAN_RES, 3, 1, seed=7, amp=0.06)[..., 0]
    data["tex_mean_uv"] = np.clip(base[None, None] + var, 0, 1).astype(np.float32)
    data["tex_basis_uv"] = smooth_field(
        BASIS_RES, 3, N_TEX, seed=11, amp=0.08
    ).astype(np.float32)

    # tangent-space normal map: mean = flat +Z with mild smooth relief;
    # encoded [0,1] (0.5, 0.5, 1.0 = undisturbed)
    n_var = smooth_field(MEAN_RES, 2, 1, seed=21, amp=0.08)[..., 0]
    normal_mean = np.concatenate(
        [0.5 + n_var, np.ones((MEAN_RES, MEAN_RES, 1), np.float32)], axis=-1
    )
    data["normal_mean_uv"] = np.clip(normal_mean, 0, 1).astype(np.float32)
    nb = np.zeros((BASIS_RES, BASIS_RES, 3, N_TEX), np.float32)
    nb[..., :2, :] = smooth_field(BASIS_RES, 2, N_TEX, seed=23, amp=0.06)
    data["normal_basis_uv"] = nb

    # specular weight map: mean ~0.35 (skin sheen) with smooth variation
    s_var = smooth_field(MEAN_RES, 1, 1, seed=31, amp=0.1)[..., 0]
    data["spec_mean_uv"] = np.clip(0.35 + s_var, 0, 1).astype(np.float32)
    data["spec_basis_uv"] = smooth_field(
        BASIS_RES, 1, N_TEX, seed=33, amp=0.15
    ).astype(np.float32)

    np.savez_compressed(path, **data)
    print(f"updated {path}: face_uv {face_uv.shape} "
          f"({len(np.unique(groups))} islands), "
          f"normal/spec maps at {MEAN_RES}^2 mean / {BASIS_RES}^2 basis")


if __name__ == "__main__":
    main(*sys.argv[1:])
