"""Camera projection math (batched, jit-friendly).

Mirrors the reference's projection semantics:
  * perspective K-projection (reference: utils/fh_utils.py:30-39)
  * orthographic-with-z (reference: utils/traineval_util.py:288-302)
  * DART ortho camera u = s*x + tu, v = s*y + tv
    (reference: utils/traineval_util.py:357-369)
  * K -> NDC focal/principal conversion used to drive the renderer
    (reference: models_res_nimble.py:228-235)
"""

from __future__ import annotations

import jax.numpy as jnp


def perspective_project(xyz: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Project camera-space points with intrinsics.

    Args:
      xyz: (B, N, 3) points in camera coordinates.
      K:   (B, 3, 3) intrinsics.
    Returns:
      (B, N, 2) pixel coordinates.
    """
    uvw = jnp.einsum("bij,bnj->bni", K, xyz, precision="highest")
    return uvw[..., :2] / uvw[..., 2:3]


def orthographic_proj_withz(
    X: jnp.ndarray, trans: jnp.ndarray, scale: jnp.ndarray, offset_z: float = 0.0
) -> jnp.ndarray:
    """Scaled orthographic projection preserving z.

    X: (B, N, 3); trans: (B, 2); scale: (B, 1). Returns (B, N, 3).
    """
    scale = scale.reshape(-1, 1, 1)
    trans = trans.reshape(scale.shape[0], 1, -1)
    proj = scale * X
    proj_xy = proj[..., :2] + trans
    proj_z = proj[..., 2:3] + offset_z
    return jnp.concatenate([proj_xy, proj_z], axis=-1)


def orthographic_project(points3d: jnp.ndarray, ortho_cam: jnp.ndarray) -> jnp.ndarray:
    """DART-style fitted ortho camera: (B,N,3), (B,3)=[s,tu,tv] -> (B,N,2)."""
    s = ortho_cam[:, 0:1]
    u = s * points3d[..., 0] + ortho_cam[:, 1:2]
    v = s * points3d[..., 1] + ortho_cam[:, 2:3]
    return jnp.stack([u, v], axis=-1)


def intrinsics_to_ndc(K: jnp.ndarray, image_size: float = 224.0):
    """Convert pixel intrinsics to NDC focal/principal point.

    Returns (focal (B,2), principal (B,2)) with the same sign convention the
    reference feeds PyTorch3D (it negates focal at the call site; our renderer
    consumes these directly — see hifihr_tpu.render.camera).
    """
    half = image_size / 2.0
    fx = K[:, 0, 0] * 2.0 / image_size
    fy = K[:, 1, 1] * 2.0 / image_size
    px = -(K[:, 0, 2] - half) * 2.0 / image_size
    py = -(K[:, 1, 2] - half) * 2.0 / image_size
    return jnp.stack([fx, fy], axis=-1), jnp.stack([px, py], axis=-1)


def depth_to_pointcloud(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Back-project a depth map to camera-space points.

    depth (B, H, W) with 0 = background; K (B, 3, 3).
    Returns (B, H*W, 4): xyz + validity flag (batched, static-shaped —
    replaces the reference's nonzero-indexing batch_depth2pc,
    utils/fh_utils.py:685-717, which cannot run under jit).
    """
    b, h, w = depth.shape
    us = jnp.arange(w, dtype=depth.dtype)[None, None, :]
    vs = jnp.arange(h, dtype=depth.dtype)[None, :, None]
    fx = K[:, 0, 0][:, None, None]
    fy = K[:, 1, 1][:, None, None]
    cx = K[:, 0, 2][:, None, None]
    cy = K[:, 1, 2][:, None, None]
    x = (us - cx) * depth / (fx + 1e-5)
    y = (vs - cy) * depth / (fy + 1e-5)
    valid = (depth > 0).astype(depth.dtype)
    pc = jnp.stack([x, y, depth, valid], axis=-1)
    return pc.reshape(b, h * w, 4)
