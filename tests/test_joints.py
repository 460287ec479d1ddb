import numpy as np
import jax.numpy as jnp

from hifihr_tpu.geometry import joints as J
from hifihr_tpu.geometry.projection import (
    perspective_project,
    orthographic_project,
    orthographic_proj_withz,
    intrinsics_to_ndc,
)


def _apply_mapping_loop(x, mapping):
    """Reference-style dict loop (utils/fh_utils.py:542-556)."""
    out = np.zeros_like(x)
    for src, dst in mapping.items():
        out[:, dst] = x[:, src]
    return out


def test_mano_to_frei_matches_reference_loop(rng):
    x = rng.randn(3, 21, 3).astype(np.float32)
    mapping = {0: 0, 1: 5, 2: 6, 3: 7, 4: 8, 5: 9, 6: 10, 7: 11, 8: 12,
               9: 17, 10: 18, 11: 19, 12: 20, 13: 13, 14: 14, 15: 15, 16: 16,
               17: 1, 18: 2, 19: 3, 20: 4}
    np.testing.assert_array_equal(
        np.asarray(J.remap(jnp.asarray(x), J.MANO_TO_FREI)),
        _apply_mapping_loop(x, mapping),
    )


def test_permutations_are_bijections():
    for perm in [J.MANO_TO_FREI, J.MANO_TO_RHD, J.RHD_TO_FREI, J.HO3D_TO_FREI,
                 J.FREI_TO_HO3D, J.RHD_TO_MANO]:
        assert sorted(perm.tolist()) == list(range(21))


def test_rhd_mano_roundtrip(rng):
    x = rng.randn(2, 21, 3).astype(np.float32)
    back = J.remap(J.remap(jnp.asarray(x), J.MANO_TO_RHD), J.RHD_TO_MANO)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_ho3d_frei_roundtrip(rng):
    x = rng.randn(2, 21, 3).astype(np.float32)
    back = J.remap(J.remap(jnp.asarray(x), J.HO3D_TO_FREI), J.FREI_TO_HO3D)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_perspective_project():
    K = jnp.asarray([[[100.0, 0, 112], [0, 100.0, 112], [0, 0, 1]]])
    xyz = jnp.asarray([[[0.0, 0.0, 1.0], [0.1, -0.2, 2.0]]])
    uv = np.asarray(perspective_project(xyz, K))
    np.testing.assert_allclose(uv[0, 0], [112.0, 112.0], atol=1e-5)
    np.testing.assert_allclose(uv[0, 1], [112 + 100 * 0.05, 112 - 100 * 0.1], atol=1e-4)


def test_ortho_project():
    cam = jnp.asarray([[2.0, 10.0, 20.0]])
    pts = jnp.asarray([[[1.0, 2.0, 3.0]]])
    uv = np.asarray(orthographic_project(pts, cam))
    np.testing.assert_allclose(uv[0, 0], [12.0, 24.0])


def test_ortho_proj_withz():
    X = jnp.asarray([[[1.0, 2.0, 3.0]]])
    out = np.asarray(orthographic_proj_withz(X, jnp.asarray([[5.0, 6.0]]), jnp.asarray([[2.0]])))
    np.testing.assert_allclose(out[0, 0], [7.0, 10.0, 6.0])


def test_intrinsics_to_ndc():
    K = jnp.asarray([[[224.0, 0, 112.0], [0, 448.0, 56.0], [0, 0, 1]]])
    focal, prp = intrinsics_to_ndc(K)
    np.testing.assert_allclose(np.asarray(focal)[0], [2.0, 4.0])
    np.testing.assert_allclose(np.asarray(prp)[0], [0.0, 0.5])
