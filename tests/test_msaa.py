"""MSAA mode: coverage parity with SSAA, kernel parity with emulation."""

import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.render.raster_jax import project_to_screen
from hifihr_tpu.render.raster_msaa import rasterize_msaa_pallas
from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings

S = 32


def _scene():
    K = jnp.asarray([[[float(S), 0, S / 2], [0, float(S), S / 2], [0, 0, 1]]])
    verts = jnp.asarray([[[-0.4, -0.4, 1.0], [0.4, -0.4, 1.0], [0.0, 0.45, 1.0]]])
    faces = np.asarray([[0, 1, 2]], np.int32)
    colors = jnp.ones_like(verts) * 0.7
    return K, verts, faces, colors


def test_msaa_kernel_matches_emulation(rng):
    K, verts, faces, _ = _scene()
    vs = project_to_screen(verts, K)
    fid_k, cov_k, _ = rasterize_msaa_pallas(vs, jnp.asarray(faces), S, samples=3,
                                            interpret=True)
    renderer = PhongRenderer(faces, RenderSettings(S, 3, backend="jax",
                                                   face_chunk=4, aa_mode="msaa"))
    fid_e, cov_e = renderer._select_faces_msaa(verts, K)
    np.testing.assert_allclose(np.asarray(cov_k), np.asarray(cov_e), atol=1e-6)
    # face ids agree wherever covered
    covered = np.asarray(cov_e) > 0
    np.testing.assert_array_equal(
        np.asarray(fid_k)[covered] >= 0, np.asarray(fid_e)[covered] >= 0
    )


@pytest.mark.slow
def test_msaa_alpha_equals_ssaa_pooled_alpha():
    K, verts, faces, colors = _scene()
    r_msaa = PhongRenderer(faces, RenderSettings(S, 3, backend="jax", face_chunk=4,
                                                 aa_mode="msaa"))
    r_ssaa = PhongRenderer(faces, RenderSettings(S, 3, backend="jax", face_chunk=4,
                                                 aa_mode="ssaa"))
    rgba_m = np.asarray(r_msaa(verts, colors, K))
    rgba_s = np.asarray(r_ssaa(verts, colors, K))
    np.testing.assert_allclose(rgba_m[..., 3], rgba_s[..., 3], atol=1e-6)
    # interior RGB matches closely (flat-shaded triangle)
    interior = rgba_s[..., 3] == 1.0
    assert interior.sum() > 20
    np.testing.assert_allclose(
        rgba_m[..., :3][interior], rgba_s[..., :3][interior], atol=0.02
    )


@pytest.mark.slow
def test_msaa_coverage_matches_ssaa_on_hand_mesh():
    """Full-mesh coverage parity (guards quantisation bugs the one-triangle
    scene can't see, e.g. bf16 default-precision selection matmuls)."""
    import jax

    from hifihr_tpu.hand.mano import ManoLayer
    from hifihr_tpu.render import raster_jax
    from hifihr_tpu.render.raster_msaa import rasterize_msaa_pallas

    size = 112
    mano = ManoLayer(ncomps=45)
    rng = np.random.RandomState(0)
    pose = jnp.asarray(rng.randn(1, 48) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.randn(1, 10) * 0.1, jnp.float32)
    verts = mano(pose, beta).verts + jnp.asarray([0.0, 0.0, 0.5])
    f = size * 1.8
    K = jnp.asarray([[[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]]], jnp.float32)
    vs = raster_jax.project_to_screen(verts, K)
    fid, cov, _ = rasterize_msaa_pallas(vs, mano.faces, size, samples=3,
                                        interpret=True)

    big = size * 3
    K_big = K * jnp.asarray([[3.0, 1, 3], [1, 3.0, 3], [1, 1, 1]])
    vs_big = raster_jax.project_to_screen(verts, K_big)
    fid_big, _ = raster_jax.rasterize_face_id(vs_big, mano.faces, big, chunk=256)
    fb = np.asarray(fid_big).reshape(1, size, 3, size, 3)
    cov_ref = (fb >= 0).mean(axis=(2, 4))

    assert cov_ref.max() == 1.0  # scene actually covers pixels
    np.testing.assert_allclose(np.asarray(cov), cov_ref, atol=1e-6)
    covered = cov_ref > 0
    np.testing.assert_array_equal(np.asarray(fid)[covered] >= 0, True)


@pytest.mark.slow
def test_msaa_gradients_finite():
    import jax

    K, verts, faces, colors = _scene()
    renderer = PhongRenderer(faces, RenderSettings(S, 3, backend="jax", face_chunk=4,
                                                   aa_mode="msaa"))

    def f(v, c):
        return jnp.sum(renderer(v, c, K)[..., :3])

    g = jax.grad(f, argnums=(0, 1))(verts, colors)
    for x in g:
        assert np.all(np.isfinite(np.asarray(x)))
    assert float(jnp.abs(g[1]).max()) > 0
