"""Loss primitives (pure JAX; each mirrors a reference formula exactly).

References: utils/losses_util.py (tsa_pose_loss :139-215, bone_direction_loss
:217-283, edge_length_loss :285-301, iou :366-378), losses.py (Huber-like 2D
distance :46-56), pytorch3d mesh_laplacian_smoothing via the precomputed
uniform Laplacian (hifihr_tpu.render.mesh.uniform_laplacian).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hifihr_tpu.geometry.joints import FREI_BONES

_PI = float(np.pi)
_D = _PI / 180.0

# Tilt-swing-azimuth per-joint hinge limits (radians), 16 joints x 3,
# transcribed from reference utils/losses_util.py:180-215 (active variant).
_TSA_MAX = np.array(
    [[3.15, 0.01, 0.01]]
    + [[5 * _D, 10 * _D, 100 * _D], [5 * _D, 5 * _D, 100 * _D], [5 * _D, 5 * _D, 100 * _D]]  # index
    + [[5 * _D, 10 * _D, 100 * _D], [5 * _D, 5 * _D, 100 * _D], [5 * _D, 5 * _D, 100 * _D]]  # middle
    + [[5 * _D, 20 * _D, 100 * _D], [5 * _D, 5 * _D, 100 * _D], [5 * _D, 5 * _D, 100 * _D]]  # pinky
    + [[5 * _D, 10 * _D, 100 * _D], [5 * _D, 5 * _D, 100 * _D], [5 * _D, 5 * _D, 100 * _D]]  # ring
    + [[90 * _D, 3 * _PI / 16, _PI / 8], [5 * _D, 5 * _D, _PI / 8], [5 * _D, 5 * _D, 100 * _D]],  # thumb
    dtype=np.float32,
)
_TSA_MIN = np.array(
    [[3.13, -0.01, -0.01]]
    + [[-5 * _D, -10 * _D, -10 * _D], [-5 * _D, -5 * _D, -10 * _D], [-5 * _D, -5 * _D, -10 * _D]]
    + [[-5 * _D, -10 * _D, -10 * _D], [-5 * _D, -5 * _D, -10 * _D], [-5 * _D, -5 * _D, -10 * _D]]
    + [[-20 * _D, -10 * _D, -10 * _D], [-5 * _D, -5 * _D, -10 * _D], [-5 * _D, -5 * _D, -10 * _D]]
    + [[-5 * _D, -10 * _D, -10 * _D], [-5 * _D, -5 * _D, -10 * _D], [-5 * _D, -5 * _D, -10 * _D]]
    + [[0.0, -_PI / 8, -_PI / 8], [-5 * _D, -5 * _D, -_PI / 8], [-5 * _D, -5 * _D, -20 * _D]],
    dtype=np.float32,
)
_TSA_CHANNEL_W = np.array([1.0, 1.0, 2.0], dtype=np.float32)


def tsa_pose_loss(tsa_poses: jnp.ndarray) -> jnp.ndarray:
    """Hinge penalty outside per-joint angle limits. tsa_poses: (B, 16, 3)."""
    hi = jnp.asarray(_TSA_MAX)[None]
    lo = jnp.asarray(_TSA_MIN)[None]
    err = jnp.maximum(tsa_poses - hi, 0.0) + jnp.maximum(lo - tsa_poses, 0.0)
    return jnp.mean(err * jnp.asarray(_TSA_CHANNEL_W))


def bone_direction_loss(
    j2d: jnp.ndarray, j2d_ref: jnp.ndarray, conf: jnp.ndarray
) -> jnp.ndarray:
    """Confidence-weighted squared difference of normalised 2D bone vectors.

    j2d, j2d_ref: (B, 21, 2+) (FreiHAND order); conf: (B, 21, 1).
    Bone confidence = conf[parent] * conf[child] (losses_util.py:259-281).
    """
    pa, ch = FREI_BONES[:, 0], FREI_BONES[:, 1]
    bones = j2d[:, ch] - j2d[:, pa]  # (B, 20, D)
    bones_ref = j2d_ref[:, ch] - j2d_ref[:, pa]
    nb = bones / (jnp.linalg.norm(bones, axis=-1, keepdims=True) + 1e-4)
    nr = bones_ref / (jnp.linalg.norm(bones_ref, axis=-1, keepdims=True) + 1e-4)
    bone_conf = conf[:, pa, 0] * conf[:, ch, 0]  # (B, 20)
    return jnp.mean(jnp.sum((nb - nr) ** 2, axis=-1) * bone_conf)


def edge_length_loss(pred: jnp.ndarray, gt: jnp.ndarray, faces) -> jnp.ndarray:
    """Mean |edge_len(pred) - edge_len(gt)| over the 3 edges of every face."""
    faces = jnp.asarray(faces, jnp.int32)

    def lengths(v):
        tri = v[:, faces]  # (B, F, 3, 3)
        d1 = jnp.linalg.norm(tri[:, :, 0] - tri[:, :, 1], axis=-1)
        d2 = jnp.linalg.norm(tri[:, :, 0] - tri[:, :, 2], axis=-1)
        d3 = jnp.linalg.norm(tri[:, :, 1] - tri[:, :, 2], axis=-1)
        return jnp.stack([d1, d2, d3], axis=-1)

    return jnp.mean(jnp.abs(lengths(pred) - lengths(gt)))


def iou_loss(sil_a: jnp.ndarray, sil_b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """1 - mean IoU over the batch; sils (B, H, W) or (B, H, W, 1)."""
    a = sil_a.reshape(sil_a.shape[0], -1)
    b = sil_b.reshape(sil_b.shape[0], -1)
    inter = jnp.sum(a * b, axis=1)
    union = jnp.sum(a + b, axis=1) - inter
    return 1.0 - jnp.mean(inter / (union + eps))


def laplacian_loss(verts: jnp.ndarray, laplacian: jnp.ndarray) -> jnp.ndarray:
    """Uniform-Laplacian smoothing: mean ||L v||_2 per vertex.

    Matches pytorch3d mesh_laplacian_smoothing(method='uniform')
    (losses_util.py:340-364) given the precomputed dense L.
    """
    lap = jnp.einsum("uv,bvd->bud", laplacian, verts, precision="highest")
    return jnp.mean(jnp.linalg.norm(lap, axis=-1))


def huber_2d_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reference's piecewise 2D keypoint distance (losses.py:47-48):
    d < 5 px -> d^2/10 else d - 2.5.  Returns (B, 21)."""
    d = jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1) + 1e-12)
    return jnp.where(d < 5.0, d * d / 10.0, d - 2.5)


def chamfer_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> tuple:
    """Symmetric Chamfer distances ((B,), (B,)) between point sets
    (reference utils/losses_util.py:304-337 ChamferLoss)."""
    d2 = (
        jnp.sum(pred**2, -1)[:, :, None]
        + jnp.sum(gt**2, -1)[:, None, :]
        - 2.0 * jnp.einsum("bnd,bmd->bnm", pred, gt, precision="highest")
    )
    return jnp.mean(jnp.min(d2, axis=2), axis=1), jnp.mean(jnp.min(d2, axis=1), axis=1)
