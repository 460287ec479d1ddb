"""Pallas kernel parity vs the pure-JAX rasteriser (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from hifihr_tpu.render.raster_jax import project_to_screen, rasterize_face_id
from hifihr_tpu.render.raster_pallas import rasterize_face_id_pallas


def _random_mesh(rng, B=2, V=24, F=30):
    verts = rng.randn(B, V, 3).astype(np.float32) * 0.2
    verts[..., 2] += 1.0  # in front of camera
    faces = rng.randint(0, V, size=(F, 3)).astype(np.int32)
    return jnp.asarray(verts), jnp.asarray(faces)


def test_pallas_matches_jax_rasterizer(rng):
    S = 128  # one tile
    K = jnp.tile(
        jnp.asarray([[[S * 1.0, 0, S / 2], [0, S * 1.0, S / 2], [0, 0, 1]]]), (2, 1, 1)
    )
    verts, faces = _random_mesh(rng)
    vs = project_to_screen(verts, K)
    fid_ref, zbuf_ref = rasterize_face_id(vs, faces, S, chunk=8)
    fid_pl, zbuf_pl = rasterize_face_id_pallas(vs, faces, S, tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(fid_pl), np.asarray(fid_ref))
    cov = np.asarray(fid_ref) >= 0
    np.testing.assert_allclose(
        np.asarray(zbuf_pl)[cov], np.asarray(zbuf_ref)[cov], rtol=1e-5
    )


def test_pallas_multi_tile(rng):
    S = 160  # not a tile multiple -> exercises padding/cropping
    K = jnp.tile(
        jnp.asarray([[[S * 1.0, 0, S / 2], [0, S * 1.0, S / 2], [0, 0, 1]]]), (1, 1, 1)
    )
    verts, faces = _random_mesh(rng, B=1, V=12, F=16)
    vs = project_to_screen(verts, K)
    fid_ref, _ = rasterize_face_id(vs, faces, S, chunk=8)
    fid_pl, _ = rasterize_face_id_pallas(vs, faces, S, tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(fid_pl), np.asarray(fid_ref))
