"""NIMBLE parametric hand layer (20/30/10 shape/pose/texture PCA).

Implements the reference call-site contract (models_res_nimble.py:57,
132-142): `layer(hand_params) -> {nimble_joints (B,25,3), skin_verts
(B,5990,3), skin_albedo, mano_verts (B,778,3), textures, joints (B,21,3 in
legacy mano order), rot}`.  The upstream NIMBLE implementation is a MISSING
git submodule and its licensed assets are not redistributable, so this layer
runs on the derived asset set from tools/make_nimble_assets.py (MANO-refined
5990-vert skin mesh, exact 778-vert prefix downsample, 25 joints) +
tools/make_nimble_uv.py (UV atlas + UV-space appearance PCA; `textures` is a
(B, tex_size, tex_size, 3) diffuse map sampled per-fragment by the renderer,
like the reference's textured Meshes at models_res_nimble.py:132-142).
Converting the real NIMBLE release into the same npz schema upgrades fidelity
with no code change.

Pose space: 30 PCA coefficients over the finger axis-angle space (basis rows
from the asset), global rotation from hand_params['rot'] when present (the
reference's nimble HandEncoder has no rot head; pose coeffs absorb it — both
are supported).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hifihr_tpu.geometry.rotations import axis_angle_to_matrix

_ASSETS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"
)
# a converted licensed NIMBLE release (assets/nimble.npz, same schema) takes
# precedence over the MANO-derived placeholder with no code change
_ASSET = os.path.join(_ASSETS_DIR, "nimble.npz")
if not os.path.exists(_ASSET):
    _ASSET = os.path.join(_ASSETS_DIR, "nimble_placeholder.npz")

# legacy mano joint order used by the reference's nimble branch
# (hand_3d_model.py:206-210): chain joints with tips inserted at 4/8/12/16/20
_MANO_ORDER_CHAIN = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_TIP_SLOTS = {4: 16, 8: 17, 12: 18, 16: 19, 20: 20}  # out slot -> joint25 idx


class NimbleModel(NamedTuple):
    v_template: np.ndarray
    faces: np.ndarray
    shapedirs: np.ndarray
    J_regressor: np.ndarray
    lbs_weights: np.ndarray
    pose_basis: np.ndarray
    hands_mean: np.ndarray
    tex_mean: np.ndarray
    tex_basis: np.ndarray
    mano_vertex_map: np.ndarray
    parents: np.ndarray
    posedirs: np.ndarray | None = None  # (V, 3, 135) pose correctives
    # UV appearance model (reference NIMBLE PCA diffuse/normal/spec maps,
    # models_res_nimble.py:132-142); derived by tools/make_nimble_uv.py
    vert_uv: np.ndarray | None = None  # (V, 2) in [0,1]
    tex_mean_uv: np.ndarray | None = None  # (h, w, 3) low-res mean map
    tex_basis_uv: np.ndarray | None = None  # (h, w, 3, T) low-res PCA maps
    face_uv: np.ndarray | None = None  # (F, 3, 2) per-corner seamed atlas
    normal_mean_uv: np.ndarray | None = None  # (h, w, 3) tangent-space [0,1]
    normal_basis_uv: np.ndarray | None = None  # (h, w, 3, T)
    spec_mean_uv: np.ndarray | None = None  # (h, w, 1)
    spec_basis_uv: np.ndarray | None = None  # (h, w, 1, T)


@lru_cache(maxsize=2)
def load_nimble_model(path: str | None = None) -> NimbleModel:
    with np.load(path or _ASSET) as z:
        return NimbleModel(**{k: z[k] for k in NimbleModel._fields if k in z.files})


class NimbleLayer:
    def __init__(self, model: NimbleModel | None = None, shape_ncomp: int = 20,
                 pose_ncomp: int = 30, tex_ncomp: int = 10, tex_size: int = 256):
        m = model or load_nimble_model()
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        self.shape_ncomp = shape_ncomp
        self.pose_ncomp = min(pose_ncomp, m.pose_basis.shape[0])
        self.tex_ncomp = tex_ncomp
        # host copies for static precomputations (renderer face ordering)
        self.v_template_np = np.asarray(m.v_template, np.float32)
        self.faces_np = np.asarray(m.faces, np.int32)
        self.face_uv_np = (
            np.asarray(m.face_uv, np.float32) if m.face_uv is not None else None
        )
        self.v_template = f32(m.v_template)
        self.skin_faces = jnp.asarray(m.faces, jnp.int32)
        self.shapedirs = f32(m.shapedirs[..., :shape_ncomp])
        self.J_regressor = f32(m.J_regressor)
        self.lbs_weights = f32(m.lbs_weights)
        self.pose_basis = f32(m.pose_basis[: self.pose_ncomp])
        self.hands_mean = f32(m.hands_mean)
        self.tex_mean = f32(m.tex_mean)
        self.tex_basis = f32(m.tex_basis[..., :tex_ncomp])
        self.mano_vertex_map = jnp.asarray(m.mano_vertex_map, jnp.int32)
        self.parents = np.asarray(m.parents)
        self.n_verts = m.v_template.shape[0]
        self.posedirs = (
            f32(m.posedirs.reshape(self.n_verts * 3, 135))
            if m.posedirs is not None
            else None
        )
        # UV appearance model: low-res stored maps -> render-res once at init.
        # Mean/basis triples (diffuse, tangent-space normal, spec weight) are
        # concatenated channel-wise into ONE (h, w, 7[, T]) stack so the
        # renderer samples all appearance channels with a single gather.
        self.vert_uv = f32(m.vert_uv) if m.vert_uv is not None else None
        self.face_uv = f32(m.face_uv) if m.face_uv is not None else None
        self.tex_mean_uv = None
        self.tex_basis_uv = None
        if m.tex_mean_uv is not None and m.tex_basis_uv is not None:
            def up(a, c):
                return jax.image.resize(f32(a), (tex_size, tex_size) + tuple(c),
                                        "bilinear")

            means = [up(m.tex_mean_uv, (3,))]
            bases = [up(m.tex_basis_uv[..., :tex_ncomp],
                        (3, min(tex_ncomp, m.tex_basis_uv.shape[-1])))]
            if m.normal_mean_uv is not None and m.spec_mean_uv is not None:
                means += [up(m.normal_mean_uv, (3,)), up(m.spec_mean_uv, (1,))]
                bases += [
                    up(m.normal_basis_uv[..., :tex_ncomp],
                       (3, min(tex_ncomp, m.normal_basis_uv.shape[-1]))),
                    up(m.spec_basis_uv[..., :tex_ncomp],
                       (1, min(tex_ncomp, m.spec_basis_uv.shape[-1]))),
                ]
            self.tex_mean_uv = jnp.concatenate(means, axis=-1)  # (h, w, 3|7)
            self.tex_basis_uv = jnp.concatenate(bases, axis=-2)  # (h, w, 3|7, T)

        # corner-sampled appearance (renderer 'corner' texture mode): the PCA
        # mean/basis maps bilinearly sampled at the F x 3 atlas corner UVs,
        # precomputed on host.  At F≈12k faces on a 224² render each face is
        # ~1 px, so barycentric interpolation of corner samples matches
        # per-fragment UV sampling to sub-texel accuracy — and the render
        # loop drops the per-pixel texture gather AND its scatter-add
        # backward entirely (gradients to texture_params flow through one
        # small einsum).
        self.corner_mean_np = None
        self.corner_basis_np = None
        if (m.face_uv is not None and m.tex_mean_uv is not None
                and m.tex_basis_uv is not None):
            corners = np.asarray(m.face_uv, np.float64)  # (F, 3, 2)

            def csamp(img):
                a = np.asarray(img, np.float64)  # (h, w, C[, T])
                h, w = a.shape[:2]
                x = np.clip(corners[..., 0], 0.0, 1.0) * (w - 1)
                y = np.clip(corners[..., 1], 0.0, 1.0) * (h - 1)
                x0 = np.clip(np.floor(x).astype(int), 0, w - 2)
                y0 = np.clip(np.floor(y).astype(int), 0, h - 2)
                fx = (x - x0)[..., None]
                fy = (y - y0)[..., None]
                if a.ndim == 4:
                    fx, fy = fx[..., None], fy[..., None]
                t00, t01 = a[y0, x0], a[y0, x0 + 1]
                t10, t11 = a[y0 + 1, x0], a[y0 + 1, x0 + 1]
                top = t00 * (1 - fx) + t01 * fx
                bot = t10 * (1 - fx) + t11 * fx
                return (top * (1 - fy) + bot * fy).astype(np.float32)

            t = tex_ncomp
            cmeans = [csamp(m.tex_mean_uv)]
            cbases = [csamp(m.tex_basis_uv[..., :t])]
            if m.normal_mean_uv is not None and m.spec_mean_uv is not None:
                cmeans += [csamp(m.normal_mean_uv), csamp(m.spec_mean_uv)]
                cbases += [csamp(m.normal_basis_uv[..., :t]),
                           csamp(m.spec_basis_uv[..., :t])]
            self.corner_mean_np = np.concatenate(cmeans, axis=-1)  # (F,3,3|7)
            self.corner_basis_np = np.concatenate(cbases, axis=-2)  # (F,3,3|7,T)

    def __call__(self, hand_params: dict, handle_collision: bool = False) -> dict:
        with jax.default_matmul_precision("highest"):
            return self._forward(hand_params)

    def _forward(self, hand_params: dict) -> dict:
        pose = hand_params["pose_params"]  # (B, 30)
        betas = hand_params["shape_params"]  # (B, 20)
        tex = hand_params.get("texture_params")  # (B, 10) or None
        rot = hand_params.get("rot")
        b = pose.shape[0]

        hand_aa = self.hands_mean[None] + pose[:, : self.pose_ncomp] @ self.pose_basis
        root_aa = rot if rot is not None else jnp.zeros((b, 3), pose.dtype)
        full_aa = jnp.concatenate([root_aa, hand_aa], axis=1).reshape(b, 16, 3)
        rots = axis_angle_to_matrix(full_aa)  # (B, 16, 3, 3)

        v_shaped = self.v_template[None] + jnp.einsum(
            "vds,bs->bvd", self.shapedirs, betas[:, : self.shape_ncomp]
        )
        joints25 = jnp.einsum("jv,bvd->bjd", self.J_regressor, v_shaped)
        j16 = joints25[:, :16]

        # kinematic chain over the 16 skinning bones (same structure as MANO)
        parents = self.parents
        tfs = [None] * 16
        eye_row = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], pose.dtype), (b, 1, 4)
        )

        def rigid(rot_m, t):
            return jnp.concatenate(
                [jnp.concatenate([rot_m, t[..., None]], axis=-1), eye_row], axis=-2
            )

        tfs[0] = rigid(rots[:, 0], j16[:, 0])
        for j in range(1, 16):
            p = int(parents[j])
            tfs[j] = tfs[p] @ rigid(rots[:, j], j16[:, j] - j16[:, p])
        A = jnp.stack(tfs, axis=1)  # (B, 16, 4, 4)
        posed_j16 = A[:, :, :3, 3]
        inv_bind = jnp.einsum("bjxy,bjy->bjx", A[:, :, :3, :3], j16)
        A = A.at[:, :, :3, 3].add(-inv_bind)

        T = jnp.einsum("vj,bjxy->bvxy", self.lbs_weights[:, :16], A)
        v_posed = v_shaped
        if self.posedirs is not None:  # interpolated MANO pose correctives
            pose_map = (rots[:, 1:] - jnp.eye(3, dtype=rots.dtype)).reshape(b, 135)
            v_posed = v_posed + (pose_map @ self.posedirs.T).reshape(
                b, self.n_verts, 3
            )
        skin_verts = (
            jnp.einsum("bvxy,bvy->bvx", T[:, :, :3, :3], v_posed) + T[:, :, :3, 3]
        )

        # posed 25 joints: skinning bones move rigidly; tip/palm joints
        # regressed from the posed skin
        derived = jnp.einsum("jv,bvd->bjd", self.J_regressor[16:], skin_verts)
        nimble_joints = jnp.concatenate([posed_j16, derived], axis=1)

        # legacy mano-order 21 joints (tips at slots 4/8/12/16/20)
        tips = derived[:, :5]  # thumb, index, middle, ring, pinky tips
        # legacy order inserts index,middle,pinky,ring,thumb chains; tips per
        # chain: index->317-ish(=tips[1]), middle->tips[2], pinky->tips[4],
        # ring->tips[3], thumb->tips[0]
        j = posed_j16
        joints21 = jnp.stack(
            [
                j[:, 0],
                j[:, 1], j[:, 2], j[:, 3], tips[:, 1],
                j[:, 4], j[:, 5], j[:, 6], tips[:, 2],
                j[:, 7], j[:, 8], j[:, 9], tips[:, 4],
                j[:, 10], j[:, 11], j[:, 12], tips[:, 3],
                j[:, 13], j[:, 14], j[:, 15], tips[:, 0],
            ],
            axis=1,
        )

        albedo = self.tex_mean[None]
        if tex is not None:
            albedo = albedo + jnp.einsum(
                "vdt,bt->bvd", self.tex_basis, tex[:, : self.tex_ncomp]
            )
        albedo = jnp.clip(albedo, 0.0, 1.0)
        albedo = jnp.broadcast_to(albedo, (b,) + albedo.shape[1:]) if albedo.shape[0] == 1 else albedo

        # UV texture image from the PCA appearance model (the reference's
        # textures output is the per-face UV texture, models_res_nimble.py:140)
        texture_image = None
        if self.tex_mean_uv is not None:
            texture_image = jnp.broadcast_to(
                self.tex_mean_uv[None], (b,) + self.tex_mean_uv.shape
            )
            if tex is not None:
                texture_image = texture_image + jnp.einsum(
                    "hwct,bt->bhwc", self.tex_basis_uv, tex[:, : self.tex_ncomp]
                )
            texture_image = jnp.clip(texture_image, 0.0, 1.0)

        return {
            "nimble_joints": nimble_joints,
            "verts": skin_verts,
            "skin_verts": skin_verts,
            "skin_albedo": albedo,
            "mano_verts": skin_verts[:, self.mano_vertex_map],
            "textures": texture_image if texture_image is not None else albedo,
            "joints": joints21,
            "rot": root_aa,
        }
