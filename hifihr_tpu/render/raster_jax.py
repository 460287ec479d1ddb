"""Z-buffer triangle rasterization: face-selection pass (pure-JAX reference).

Replaces PyTorch3D's CUDA `rasterize_meshes` (consumed by the reference at
models_res_nimble.py:72-96, 208).  Split into:

  1. `rasterize_face_id` — per-pixel nearest-face selection (int32 id, -1 for
     background).  Discrete, **not differentiated**; the TPU-optimised Pallas
     version lives in hifihr_tpu.render.raster_pallas with identical outputs.
  2. `barycentric_and_z` / attribute interpolation (hifihr_tpu.render
     .interpolate) — differentiable recompute of barycentrics for the selected
     faces, giving the same gradients PyTorch3D's hard rasteriser produces
     (d attr / d verts through barycentric weights).

Screen convention: pixel coordinates, u right / v down, pixel centers at
(i + 0.5); a vertex is projected by u = fx*x/z + cx (OpenCV-style K), matching
the reference's proj_func (utils/fh_utils.py:30-39) so rendered pixels align
with projected keypoints by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def project_to_screen(verts_cam: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """verts_cam (B, V, 3), K (B, 3, 3) pixel intrinsics -> (B, V, 3) [u, v, z]."""
    z = verts_cam[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = K[:, None, 0, 0:1] * verts_cam[..., 0:1] / z_safe + K[:, None, 0, 2:3]
    v = K[:, None, 1, 1:2] * verts_cam[..., 1:2] / z_safe + K[:, None, 1, 2:3]
    return jnp.concatenate([u, v, verts_cam[..., 2:3]], axis=-1)


def _edge(ax, ay, bx, by, px, py):
    """Signed area edge function (positive = left of a->b)."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


@partial(jax.jit, static_argnames=("image_size", "chunk"))
def rasterize_face_id(
    verts_screen: jnp.ndarray,
    faces: jnp.ndarray,
    image_size: int,
    chunk: int = 128,
):
    """Nearest-face id per pixel.

    Args:
      verts_screen: (B, V, 3) [u, v, z] screen-space vertices (z = camera depth).
      faces: (F, 3) int32.
      image_size: output H == W.
      chunk: faces processed per scan step (memory/speed tradeoff).
    Returns:
      face_id: (B, H, W) int32, -1 where no face covers the pixel.
      zbuf:    (B, H, W) float32 depth of the selected face (inf background).
    """
    verts_screen = jax.lax.stop_gradient(verts_screen)
    B = verts_screen.shape[0]
    F = faces.shape[0]
    S = image_size

    tri = verts_screen[:, faces]  # (B, F, 3, 3)
    # pad F to a multiple of chunk with degenerate (skipped) faces
    pad = (-F) % chunk
    if pad:
        tri = jnp.concatenate([tri, jnp.zeros((B, pad, 3, 3), tri.dtype)], axis=1)
    n_chunks = tri.shape[1] // chunk
    tri = tri.reshape(B, n_chunks, chunk, 3, 3)

    px = jnp.arange(S, dtype=jnp.float32) + 0.5
    pix_u = jnp.broadcast_to(px[None, :], (S, S))  # (H, W)
    pix_v = jnp.broadcast_to(px[:, None], (S, S))

    def per_image(tri_img):
        def body(carry, tri_chunk):
            zbuf, fid, base = carry
            ax, ay, az = tri_chunk[:, 0, 0], tri_chunk[:, 0, 1], tri_chunk[:, 0, 2]
            bx, by, bz = tri_chunk[:, 1, 0], tri_chunk[:, 1, 1], tri_chunk[:, 1, 2]
            cx, cy, cz = tri_chunk[:, 2, 0], tri_chunk[:, 2, 1], tri_chunk[:, 2, 2]
            # (F', H, W) edge functions
            u = pix_u[None]
            v = pix_v[None]
            e0 = _edge(bx[:, None, None], by[:, None, None], cx[:, None, None], cy[:, None, None], u, v)
            e1 = _edge(cx[:, None, None], cy[:, None, None], ax[:, None, None], ay[:, None, None], u, v)
            e2 = _edge(ax[:, None, None], ay[:, None, None], bx[:, None, None], by[:, None, None], u, v)
            area = (e0 + e1 + e2)
            area_safe = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
            w0, w1, w2 = e0 / area_safe, e1 / area_safe, e2 / area_safe
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(area) > 1e-12)
            valid = ((az > 1e-6) & (bz > 1e-6) & (cz > 1e-6))[:, None, None]
            z = w0 * az[:, None, None] + w1 * bz[:, None, None] + w2 * cz[:, None, None]
            z = jnp.where(inside & valid, z, jnp.inf)
            # nearest face within the chunk, then merge with carry
            zmin = jnp.min(z, axis=0)
            amin = jnp.argmin(z, axis=0).astype(jnp.int32) + base
            better = zmin < zbuf
            return (
                jnp.where(better, zmin, zbuf),
                jnp.where(better, amin, fid),
                base + chunk,
            ), None

        init = (
            jnp.full((S, S), jnp.inf, jnp.float32),
            jnp.full((S, S), -1, jnp.int32),
            jnp.int32(0),
        )
        (zbuf, fid, _), _ = jax.lax.scan(body, init, tri_img)
        return fid, zbuf

    fid, zbuf = jax.vmap(per_image)(tri)
    return fid, zbuf
