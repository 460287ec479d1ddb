import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from hifihr_tpu.geometry.rotations import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    rot6d_to_matrix,
)


def test_axis_angle_to_matrix_matches_scipy(rng):
    aa = rng.randn(64, 3).astype(np.float32)
    got = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
    want = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_axis_angle_small_angle_stable():
    aa = jnp.array([[0.0, 0.0, 0.0], [1e-9, 0.0, 0.0]])
    m = np.asarray(axis_angle_to_matrix(aa))
    np.testing.assert_allclose(m, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-5)
    # differentiable at zero
    import jax

    g = jax.jacobian(lambda x: axis_angle_to_matrix(x).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_matrix_to_axis_angle_roundtrip(rng):
    aa = rng.uniform(-1.5, 1.5, size=(32, 3)).astype(np.float32)
    m = axis_angle_to_matrix(jnp.asarray(aa))
    aa2 = np.asarray(matrix_to_axis_angle(m))
    m2 = R.from_rotvec(aa2).as_matrix()
    np.testing.assert_allclose(np.asarray(m), m2, atol=1e-4)


def test_rot6d_is_rotation(rng):
    x = rng.randn(16, 6).astype(np.float32)
    m = np.asarray(rot6d_to_matrix(jnp.asarray(x)))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), np.ones(16), atol=1e-5)
    # first column preserved up to normalisation
    np.testing.assert_allclose(
        m[:, :, 0], x[:, :3] / np.linalg.norm(x[:, :3], axis=1, keepdims=True), atol=1e-5
    )
