"""Generate NIMBLE-layer assets.

The reference consumes NIMBLE through a git submodule that is MISSING
upstream (SURVEY.md §2: utils/NIMBLE_model), and the licensed NIMBLE release
(bone/muscle/skin PCA + appearance model) cannot be downloaded here.  This
tool therefore *derives* a working asset set with the exact call-site
contract shapes (models_res_nimble.py:57, 132-142):

  * 5990-vert skin mesh: MANO's 778-vert mesh refined by longest-edge
    splitting until exactly 5990 vertices.  The original 778 vertices are a
    strict prefix, so the nimble->mano downsample map is `verts[:, :778]`.
  * shapedirs (5990,3,20): MANO's 10 shape dirs interpolated to the refined
    mesh + 10 smooth low-frequency modes (orthogonalised) to fill the 20-dim
    NIMBLE shape space.
  * 25 bone joints: MANO's 16 chain joints + 5 fingertips + 4 palm/carpal
    points, with an interpolated J_regressor and LBS weights.
  * appearance PCA (10): smooth per-vertex color basis around a skin-tone
    mean.

When the real NIMBLE release is available, convert it with the same npz
schema and the layer picks it up unchanged (document: data dependency, like
MANO_RIGHT.pkl).
"""

from __future__ import annotations

import heapq
import sys

import numpy as np

sys.path.insert(0, ".")

from hifihr_tpu.assets import load_mano_model  # noqa: E402

TARGET_VERTS = 5990
N_SHAPE = 20
N_TEX = 10
N_JOINTS = 25


def edge_split_refine(verts: np.ndarray, faces: np.ndarray, attrs: dict,
                      target_verts: int):
    """Longest-edge splitting until len(verts) == target_verts.

    attrs: per-vertex arrays interpolated at midpoints.
    """
    verts = [v for v in verts]
    faces = faces.tolist()
    attrs = {k: [row for row in a] for k, a in attrs.items()}

    def length(a, b):
        return float(np.linalg.norm(verts[a] - verts[b]))

    # edge -> list of face indices
    def build_heap():
        edge_faces: dict[tuple, list[int]] = {}
        for fi, f in enumerate(faces):
            for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
                e = (min(a, b), max(a, b))
                edge_faces.setdefault(e, []).append(fi)
        heap = [(-length(a, b), (a, b)) for (a, b) in edge_faces]
        heapq.heapify(heap)
        return edge_faces, heap

    edge_faces, heap = build_heap()
    stale = set()
    while len(verts) < target_verts:
        if not heap:
            edge_faces, heap = build_heap()
            stale = set()
        neg_len, e = heapq.heappop(heap)
        if e not in edge_faces or e in stale:
            continue
        a, b = e
        m = len(verts)
        verts.append((verts[a] + verts[b]) / 2.0)
        for k in attrs:
            attrs[k].append((np.asarray(attrs[k][a]) + np.asarray(attrs[k][b])) / 2.0)
        for fi in edge_faces.pop(e):
            f = faces[fi]
            # vertices of f other than a,b
            c = [v for v in f if v not in (a, b)][0]
            # replace face with (a, m, c) keeping orientation, add (m, b, c)
            ia = f.index(a)
            newf1 = list(f)
            newf1[f.index(b)] = m
            newf2 = list(f)
            newf2[ia] = m
            faces[fi] = newf1
            faces.append(newf2)
            # mark edges of the old face stale (lengths unchanged except e,
            # but face lists changed); simplest: rebuild lazily
            for x, y in ((a, c), (b, c)):
                stale.add((min(x, y), max(x, y)))
        # push the two half edges
        for x, y in ((a, m), (m, b)):
            heapq.heappush(heap, (-length(x, y), (min(x, y), max(x, y))))
        # periodically rebuild to refresh adjacency
        if len(stale) > 2000:
            edge_faces, heap = build_heap()
            stale = set()

    return (
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32),
        {k: np.asarray(v, np.float32) for k, v in attrs.items()},
    )


def smooth_modes(verts: np.ndarray, n: int, seed: int = 0) -> np.ndarray:
    """n smooth low-frequency (V,3) displacement modes from random 3D cosines."""
    rng = np.random.RandomState(seed)
    modes = []
    for i in range(n):
        freq = rng.randn(3, 3) * (2.0 + i)
        phase = rng.rand(3) * 2 * np.pi
        m = np.stack(
            [np.cos(verts @ freq[d] * 8.0 + phase[d]) for d in range(3)], axis=1
        )
        modes.append(m * 0.003)
    return np.stack(modes, axis=-1)  # (V, 3, n)


def main(out_path: str = "hifihr_tpu/assets/nimble_placeholder.npz"):
    m = load_mano_model()
    attrs = {
        "weights": m.lbs_weights,  # (778, 16)
        "shapedirs": m.shapedirs.reshape(778, 30),  # (778, 3*10)
        "posedirs": m.posedirs.reshape(778, 3 * 135),  # pose correctives
    }
    verts, faces, interp = edge_split_refine(
        m.v_template, m.faces, attrs, TARGET_VERTS
    )
    assert verts.shape[0] == TARGET_VERTS, verts.shape
    weights16 = interp["weights"]
    weights16 = weights16 / np.maximum(weights16.sum(1, keepdims=True), 1e-8)
    shapedirs10 = interp["shapedirs"].reshape(TARGET_VERTS, 3, 10)
    extra = smooth_modes(verts, N_SHAPE - 10)
    shapedirs = np.concatenate([shapedirs10, extra], axis=-1).astype(np.float32)
    posedirs = interp["posedirs"].reshape(TARGET_VERTS, 3, 135).astype(np.float32)

    # 25 joints: 16 mano chain + 5 tips (mano tip verts, prefix indices) +
    # 4 palm points (midpoints between wrist and MCPs)
    J16 = m.J_regressor @ m.v_template
    tips_idx = np.asarray([745, 317, 444, 556, 673])
    Jreg = np.zeros((N_JOINTS, TARGET_VERTS), np.float32)
    Jreg[:16, :778] = m.J_regressor
    for i, t in enumerate(tips_idx):
        Jreg[16 + i, t] = 1.0
    # palm points: average of wrist row and mcp rows (joints 1,4,7,10)
    for i, mcp in enumerate((1, 4, 7, 10)):
        Jreg[21 + i, :778] = 0.5 * (m.J_regressor[0] + m.J_regressor[mcp])

    # LBS weights over 25 "bones": reuse the 16 mano transforms; tip/palm
    # joints are derived outputs, not skinning bones -> zero columns
    weights25 = np.zeros((TARGET_VERTS, N_JOINTS), np.float32)
    weights25[:, :16] = weights16

    # appearance PCA: skin-tone mean + smooth color modes
    rng = np.random.RandomState(7)
    tex_mean = np.tile(np.asarray([[0.78, 0.57, 0.45]], np.float32), (TARGET_VERTS, 1))
    shade = 0.08 * np.cos(verts @ rng.randn(3).astype(np.float32) * 6.0)
    tex_mean = np.clip(tex_mean + shade[:, None] * np.asarray([0.5, 0.35, 0.3]), 0, 1)
    tex_basis = smooth_modes(verts, N_TEX, seed=11) * 20.0  # (V, 3, 10)

    np.savez_compressed(
        out_path,
        v_template=verts,
        faces=faces,
        shapedirs=shapedirs,  # (5990, 3, 20)
        posedirs=posedirs,  # (5990, 3, 135) interpolated MANO correctives
        J_regressor=Jreg,  # (25, 5990)
        lbs_weights=weights25,  # (5990, 25)
        pose_basis=m.hands_components[:30].astype(np.float32),  # (30, 45)
        hands_mean=m.hands_mean.astype(np.float32),
        tex_mean=tex_mean.astype(np.float32),  # (5990, 3)
        tex_basis=tex_basis.astype(np.float32),  # (5990, 3, 10)
        mano_vertex_map=np.arange(778, dtype=np.int32),  # prefix subset
        parents=m.parents,
    )
    print(f"wrote {out_path}: verts {verts.shape}, faces {faces.shape}")


if __name__ == "__main__":
    main(*sys.argv[1:])
