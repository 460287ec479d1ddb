"""High-level differentiable mesh renderer (supersampled Phong, like the ref).

Pipeline (mirrors models_res_nimble.py:72-96, 208-220, TPU-first):
  project with pixel intrinsics K (scaled by aa_factor) -> z-buffer face
  selection (Pallas on TPU / lax.scan fallback) -> differentiable barycentric
  interpolation of albedo/normals/points -> Phong shading -> alpha channel
  from coverage -> aa_factor x aa_factor average-pool anti-aliasing.

Deviations from the reference, on purpose:
  * background is black, not PyTorch3D's default white — this makes the
    self-supervised photometric loss consistent (both operands vanish off-hand;
    the reference compares a white-background render to a black-masked image
    in its texture_self branch, losses.py:317-327).
  * silhouette is returned in [0, 1] (the x255 binarisation the reference does
    at models_res_nimble.py:219 is applied by the model wrapper for parity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hifihr_tpu.render import raster_jax
from hifihr_tpu.render.interpolate import barycentric_coords, interpolate_attribute
from hifihr_tpu.render.mesh import vertex_normals
from hifihr_tpu.render.shading import DirectionalLight, Materials, phong_shade


class RenderSettings(NamedTuple):
    image_size: int = 224
    aa_factor: int = 3  # supersampling (reference uses 224*3)
    backend: str = "auto"  # 'pallas' | 'jax' | 'auto'
    face_chunk: int = 128  # lax.scan chunk for the jax backend


def _scale_intrinsics(K: jnp.ndarray, s: float) -> jnp.ndarray:
    scale = jnp.asarray([[s, 1.0, s], [1.0, s, s], [1.0, 1.0, 1.0]], K.dtype)
    return K * scale


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h // k, k, w // k, k, c).mean(axis=(2, 4))


class PhongRenderer:
    """Stateless; construct with static faces, call with batched geometry."""

    def __init__(self, faces, settings: RenderSettings = RenderSettings()):
        self.faces = jnp.asarray(faces, jnp.int32)
        self.settings = settings

    def rasterize(self, verts_cam: jnp.ndarray, K: jnp.ndarray):
        """Returns (frag dict, verts_screen) at the supersampled resolution."""
        s = self.settings
        big = s.image_size * s.aa_factor
        K_big = _scale_intrinsics(K, float(s.aa_factor))
        verts_screen = raster_jax.project_to_screen(verts_cam, K_big)
        backend = s.backend
        if backend == "auto":
            import jax

            platform = jax.devices()[0].platform
            backend = "pallas" if platform == "tpu" else "jax"
        if backend == "pallas":
            from hifihr_tpu.render.raster_pallas import rasterize_face_id_pallas

            face_id, _ = rasterize_face_id_pallas(verts_screen, self.faces, big)
        else:
            face_id, _ = raster_jax.rasterize_face_id(
                verts_screen, self.faces, big, chunk=s.face_chunk
            )
        frag = barycentric_coords(face_id, verts_screen, self.faces)
        return frag, verts_screen

    def __call__(
        self,
        verts_cam: jnp.ndarray,  # (B, V, 3) camera space, z > 0 forward
        vert_colors: jnp.ndarray,  # (B, V, 3) albedo
        K: jnp.ndarray,  # (B, 3, 3) pixel intrinsics at image_size
        light: DirectionalLight | None = None,
        materials: Materials = Materials(),
    ) -> jnp.ndarray:
        """Render -> (B, image_size, image_size, 4) RGBA, antialiased."""
        frag, _ = self.rasterize(verts_cam, K)
        normals = vertex_normals(verts_cam, self.faces)
        texels = interpolate_attribute(frag, vert_colors)
        pix_normals = interpolate_attribute(frag, normals)
        pix_points = interpolate_attribute(frag, verts_cam)
        if light is None:
            light = DirectionalLight.default(verts_cam.shape[0], verts_cam.dtype)
        rgb = phong_shade(texels, pix_normals, pix_points, light, materials)
        rgb = rgb * frag["mask"][..., None]
        rgba = jnp.concatenate([rgb, frag["mask"][..., None]], axis=-1)
        return _avg_pool(rgba, self.settings.aa_factor)
