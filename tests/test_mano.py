"""MANO layer correctness vs an independent per-sample numpy implementation.

The golden implementation below is deliberately written in a different style
(python loop over joints using the kintree parents, scipy Rotation for
Rodrigues) from the vectorised JAX layer, so agreement is a strong check of
the blendshape/kinematics/LBS math (reference semantics:
utils/my_mano.py:315-483).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from hifihr_tpu.assets import load_mano_model
from hifihr_tpu.hand.mano import ManoLayer, regress_joints_frei
from hifihr_tpu.geometry.joints import MANO_TO_FREI, remap


def golden_mano(m, pose_coeffs, betas, ncomps=45, flat_hand_mean=False, center_idx=9):
    """Loop-style numpy MANO forward. Returns (verts, joints21_manopth_order)."""
    parents = m.parents
    out_verts, out_joints = [], []
    for b in range(pose_coeffs.shape[0]):
        coeffs = pose_coeffs[b]
        beta = betas[b]
        hand_aa = coeffs[3 : 3 + ncomps] @ m.hands_components[:ncomps]
        if not flat_hand_mean:
            hand_aa = hand_aa + m.hands_mean
        full_aa = np.concatenate([coeffs[:3], hand_aa]).reshape(16, 3)
        rots = R.from_rotvec(full_aa).as_matrix()  # (16,3,3)

        v_shaped = m.v_template + m.shapedirs @ beta
        joints16 = m.J_regressor @ v_shaped
        pose_map = (rots[1:] - np.eye(3)).reshape(135)
        v_posed = v_shaped + (m.posedirs.reshape(778 * 3, 135) @ pose_map).reshape(778, 3)
        # kinematic chain, one joint at a time
        A = [None] * 16
        for j in range(16):
            T = np.eye(4)
            T[:3, :3] = rots[j]
            T[:3, 3] = joints16[j] - (joints16[parents[j]] if j > 0 else 0)
            A[j] = T if j == 0 else A[parents[j]] @ T
        A = np.stack(A)
        jtr16 = A[:, :3, 3].copy()
        # inverse bind
        for j in range(16):
            A[j, :3, 3] -= A[j, :3, :3] @ joints16[j]
        T = np.einsum("vj,jxy->vxy", m.lbs_weights, A)
        verts = np.einsum("vxy,vy->vx", T[:, :3, :3], v_posed) + T[:, :3, 3]

        tips = verts[[745, 317, 444, 556, 673]]
        jtr = np.concatenate([jtr16, tips], axis=0)
        reorder = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]
        jtr = jtr[reorder]
        if center_idx is not None:
            c = jtr[center_idx].copy()
            jtr -= c
            verts -= c
        out_verts.append(verts)
        out_joints.append(jtr)
    return np.stack(out_verts), np.stack(out_joints)


@pytest.fixture(scope="module")
def mano_model():
    return load_mano_model()


def test_mano_matches_golden(mano_model, rng):
    layer = ManoLayer(mano_model, ncomps=45)
    pose = rng.randn(4, 48).astype(np.float32) * 0.5
    betas = rng.randn(4, 10).astype(np.float32) * 0.5
    out = jax.jit(layer.__call__)(jnp.asarray(pose), jnp.asarray(betas))
    g_verts, g_joints = golden_mano(mano_model, pose, betas)
    np.testing.assert_allclose(np.asarray(out.verts), g_verts, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.joints), g_joints, atol=2e-5)


def test_mano_pca_truncation(mano_model, rng):
    """ncomps<45 must equal full-basis result with zero-padded coeffs."""
    layer30 = ManoLayer(mano_model, ncomps=30)
    layer45 = ManoLayer(mano_model, ncomps=45)
    pose30 = rng.randn(2, 33).astype(np.float32) * 0.3
    pose45 = np.concatenate([pose30, np.zeros((2, 15), np.float32)], axis=1)
    betas = rng.randn(2, 10).astype(np.float32) * 0.3
    v30 = layer30(jnp.asarray(pose30), jnp.asarray(betas)).verts
    v45 = layer45(jnp.asarray(pose45), jnp.asarray(betas)).verts
    np.testing.assert_allclose(np.asarray(v30), np.asarray(v45), atol=1e-6)


def test_mano_zero_pose_centered(mano_model):
    layer = ManoLayer(mano_model, ncomps=45)
    out = layer(jnp.zeros((1, 48)), jnp.zeros((1, 10)))
    # center_idx=9 joint must sit at the origin
    np.testing.assert_allclose(np.asarray(out.joints[0, 9]), np.zeros(3), atol=1e-6)
    # hand is ~15-20 cm scale in meters
    extent = np.ptp(np.asarray(out.verts[0]), axis=0)
    assert 0.05 < float(extent.max()) < 0.3


def test_regressed_frei_joints_close_to_layer_joints(mano_model, rng):
    """J_regressor joints (frei order) ~ the layer's (frei-ordered) joints.

    Not identical (regressed from posed verts vs chain origins; mesh-vertex
    tips differ by one vertex for the thumb) but must agree to ~1.5 cm —
    catches permutation mistakes immediately (a wrong finger is >5 cm off).
    """
    layer = ManoLayer(mano_model, ncomps=45)
    pose = rng.randn(2, 48).astype(np.float32) * 0.3
    out = layer(jnp.asarray(pose), jnp.zeros((2, 10)))
    frei_regressed = regress_joints_frei(out.verts, layer.J_regressor)
    err = np.linalg.norm(np.asarray(frei_regressed) - np.asarray(out.joints), axis=-1)
    assert err.max() < 0.015, err


@pytest.mark.slow
def test_mano_grad_finite(mano_model):
    layer = ManoLayer(mano_model, ncomps=45)

    def loss(pose, betas):
        out = layer(pose, betas)
        return jnp.sum(out.verts**2) + jnp.sum(out.joints**2)

    g = jax.grad(loss, argnums=(0, 1))(jnp.zeros((1, 48)), jnp.zeros((1, 10)))
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g)
    assert any(float(jnp.abs(x).max()) > 0 for x in g)
