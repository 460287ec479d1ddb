"""MANO parametric hand layer, fused for XLA.

Functionally equivalent to the reference's vendored manopth layer
(reference: utils/my_mano.py:225-483) — PCA pose coeffs -> axis-angle ->
rotation matrices, shape/pose blendshapes, 3-level batched kinematic chain,
linear blend skinning, fingertip assembly, joint reorder, center_idx
root-centering — but written as one pure function of (model, pose, betas).
Everything is a batched matmul or gather; there is no per-joint Python loop
over the batch, so XLA fuses the whole layer into a handful of MXU ops.

Also provides `regress_joints_frei`, the J_regressor + fingertip-vertex joint
assembly the reference's driver uses for the active MANO path
(reference: utils/Freihand_GNN_mano/Freihand_trainer_mano_fullsup.py:175-215,
wired in models_res_nimble.py:150-153).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hifihr_tpu.assets import ManoModel, load_mano_model
from hifihr_tpu.geometry.joints import (
    FREI_TIP_VERTEX,
    MANOPTH_REORDER,
    MANOPTH_TIP_VERTS,
    REGRESSED16_TO_FREI,
)
from hifihr_tpu.geometry.rotations import axis_angle_to_matrix

# Kinematic levels: finger chains run root -> lev1 -> lev2 -> lev3
# (kintree parents [-1,0,1,2,0,4,5,0,7,8,0,10,11,0,13,14]).
_LEV1 = np.array([1, 4, 7, 10, 13])
_LEV2 = np.array([2, 5, 8, 11, 14])
_LEV3 = np.array([3, 6, 9, 12, 15])
# concat order [root, lev1, lev2, lev3] -> kinematic joint index order
_LEVELS_TO_KINEMATIC = np.array(
    [0, 1, 6, 11, 2, 7, 12, 3, 8, 13, 4, 9, 14, 5, 10, 15]
)

# Gather table for the 21-joint frei-order assembly from 16 regressed joints:
# entry j = source row in the concat [joints16; tip_verts5].
_FREI_GATHER = np.zeros(21, dtype=np.int32)
for _src, _dst in REGRESSED16_TO_FREI.items():
    _FREI_GATHER[_dst] = _src
for _i, _tip in enumerate(sorted(FREI_TIP_VERTEX)):
    _FREI_GATHER[_tip] = 16 + _i
_FREI_TIP_VERTS = np.array([FREI_TIP_VERTEX[k] for k in sorted(FREI_TIP_VERTEX)])


class ManoOutput(NamedTuple):
    verts: jnp.ndarray       # (B, 778, 3)
    # NOTE: after the manopth reorder (utils/my_mano.py:465-469) the 21 joints
    # are wrist, thumb, index, middle, ring, pinky — i.e. FreiHAND order.
    # The "mano order" the fh_utils Mano2Frei permutation expects belongs to
    # the legacy hand_3d_model / NIMBLE outputs, not to this layer.
    joints: jnp.ndarray      # (B, 21, 3) FreiHAND order
    full_pose: jnp.ndarray   # (B, 16, 3) axis-angle incl. global rot ("tsa poses")


def _rigid_tf(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """rot (..., 3, 3), t (..., 3) -> homogeneous (..., 4, 4)."""
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


class ManoLayer:
    """Stateless MANO layer. Construct once; `__call__` is jit-traceable.

    Args mirror the reference layer (utils/my_mano.py:35-36): center_idx=9,
    flat_hand_mean=False, use_pca=True, ncomps = pose-PCA coefficient count.
    The reference's mano configs pass pose vectors of size 48 =
    3 (global rot) + 45 (PCA coeffs); ncomps is clamped to the 45 basis rows.
    """

    def __init__(
        self,
        model: ManoModel | None = None,
        ncomps: int = 45,
        use_pca: bool = True,
        flat_hand_mean: bool = False,
        center_idx: int | None = 9,
    ):
        m = model or load_mano_model()
        self.ncomps = min(ncomps, 45) if use_pca else 45
        self.use_pca = use_pca
        self.flat_hand_mean = flat_hand_mean
        self.center_idx = center_idx

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        # host copies for static precomputations (e.g. the renderer's spatial
        # face ordering): inside a traced flax setup the jnp attributes can be
        # tracers, which np-level geometry code must not touch
        self.v_template_np = np.asarray(m.v_template, np.float32)
        self.faces_np = np.asarray(m.faces, np.int32)
        self.v_template = f32(m.v_template)
        self.shapedirs = f32(m.shapedirs)
        self.posedirs = f32(m.posedirs.reshape(778 * 3, 135))
        self.J_regressor = f32(m.J_regressor)
        self.lbs_weights = f32(m.lbs_weights)
        self.hands_components = f32(m.hands_components[: self.ncomps])
        self.hands_mean = (
            jnp.zeros(45, jnp.float32) if flat_hand_mean else f32(m.hands_mean)
        )
        self.faces = jnp.asarray(m.faces, dtype=jnp.int32)

    def full_pose_from_coeffs(self, pose_coeffs: jnp.ndarray) -> jnp.ndarray:
        """(B, 3 + ncomps) -> (B, 16, 3) axis-angle including global rot."""
        b = pose_coeffs.shape[0]
        root = pose_coeffs[:, :3]
        hand = pose_coeffs[:, 3 : 3 + self.ncomps]
        if self.use_pca:
            hand = hand @ self.hands_components
        hand = self.hands_mean[None] + hand
        return jnp.concatenate([root, hand], axis=1).reshape(b, 16, 3)

    def __call__(self, pose_coeffs: jnp.ndarray, betas: jnp.ndarray) -> ManoOutput:
        """pose_coeffs: (B, 3+ncomps) [global rot | PCA coeffs]; betas: (B, 10)."""
        # Geometry must be exact f32: don't let XLA downcast these small matmuls.
        with jax.default_matmul_precision("highest"):
            return self._forward(pose_coeffs, betas)

    def _forward(self, pose_coeffs: jnp.ndarray, betas: jnp.ndarray) -> ManoOutput:
        b = pose_coeffs.shape[0]
        full_pose = self.full_pose_from_coeffs(pose_coeffs)  # (B,16,3)
        rots = axis_angle_to_matrix(full_pose)  # (B,16,3,3)

        # Blendshapes.
        v_shaped = self.v_template[None] + jnp.einsum(
            "vds,bs->bvd", self.shapedirs, betas
        )  # (B,778,3)
        joints16 = jnp.einsum("jv,bvd->bjd", self.J_regressor, v_shaped)  # (B,16,3)
        pose_map = (rots[:, 1:] - jnp.eye(3, dtype=rots.dtype)).reshape(b, 135)
        v_posed = v_shaped + (pose_map @ self.posedirs.T).reshape(b, 778, 3)

        # Kinematic chain, batched per level (5 fingers at once).
        root_tf = _rigid_tf(rots[:, 0], joints16[:, 0])  # (B,4,4)
        lev1_tf = root_tf[:, None] @ _rigid_tf(
            rots[:, _LEV1], joints16[:, _LEV1] - joints16[:, 0:1]
        )
        lev2_tf = lev1_tf @ _rigid_tf(
            rots[:, _LEV2], joints16[:, _LEV2] - joints16[:, _LEV1]
        )
        lev3_tf = lev2_tf @ _rigid_tf(
            rots[:, _LEV3], joints16[:, _LEV3] - joints16[:, _LEV2]
        )
        tfs = jnp.concatenate(
            [root_tf[:, None], lev1_tf, lev2_tf, lev3_tf], axis=1
        )[:, _LEVELS_TO_KINEMATIC]  # (B,16,4,4) global joint transforms

        # Remove the rest-pose joint location (inverse-bind translation).
        posed_j = jnp.einsum("bjxy,bjy->bjx", tfs[:, :, :3, :3], joints16)
        rel_tfs = tfs.at[:, :, :3, 3].add(-posed_j)  # A_j - pack(A_j [j;0])

        # LBS: per-vertex transform = weights @ per-joint transforms.
        T = jnp.einsum("vj,bjxy->bvxy", self.lbs_weights, rel_tfs)  # (B,778,4,4)
        verts = (
            jnp.einsum("bvxy,bvy->bvx", T[:, :, :3, :3], v_posed) + T[:, :, :3, 3]
        )

        # 21 joints in manopth order: 16 chain joints + 5 fingertip verts.
        jtr16 = tfs[:, :, :3, 3]
        tips = verts[:, MANOPTH_TIP_VERTS]
        jtr = jnp.concatenate([jtr16, tips], axis=1)[:, MANOPTH_REORDER]

        if self.center_idx is not None:
            center = jtr[:, self.center_idx : self.center_idx + 1]
            jtr = jtr - center
            verts = verts - center
        return ManoOutput(verts=verts, joints=jtr, full_pose=full_pose)


def regress_joints_frei(verts: jnp.ndarray, J_regressor: jnp.ndarray) -> jnp.ndarray:
    """FreiHAND-order 21 joints from a posed MANO mesh.

    verts: (B, 778, 3); J_regressor: (16, 778). Returns (B, 21, 3).
    Reference: Freihand_trainer_mano_fullsup.xyz_from_vertice (:206-215) +
    get_keypoints_from_mesh_np (:175-203).
    """
    joints16 = jnp.einsum("jv,bvd->bjd", J_regressor, verts, precision="highest")
    tips = verts[:, _FREI_TIP_VERTS]
    return jnp.concatenate([joints16, tips], axis=1)[:, _FREI_GATHER]
