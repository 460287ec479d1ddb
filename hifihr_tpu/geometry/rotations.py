"""Rotation representations, vectorised for XLA (no per-sample loops).

Numerically matches the reference's quaternion-based Rodrigues
(reference: utils/manopth/rodrigues_layer.py:15-55) including its
`norm(x + 1e-8)` regularisation so converted checkpoints reproduce bitwise
behaviour near theta=0; rot6d follows utils/manopth/rot6d.py:4-52.

All functions take arrays whose last dimension(s) carry the rotation and
broadcast over any leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def axis_angle_to_quaternion(axisang: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 4) unit quaternion (w, x, y, z)."""
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion (w, x, y, z) -> (..., 3, 3) rotation matrix."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = (quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3])
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = [
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ]
    return jnp.stack(rows, axis=-1).reshape(quat.shape[:-1] + (3, 3))


def axis_angle_to_matrix(axisang: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 3, 3), smooth at theta ~ 0."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axisang))


def matrix_to_axis_angle(mat: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle."""
    trace = mat[..., 0, 0] + mat[..., 1, 1] + mat[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0 + eps, 1.0 - eps)
    angle = jnp.arccos(cos)
    axis = jnp.stack(
        [
            mat[..., 2, 1] - mat[..., 1, 2],
            mat[..., 0, 2] - mat[..., 2, 0],
            mat[..., 1, 0] - mat[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(angle)[..., None]
    axis = axis / jnp.where(jnp.abs(sin) < eps, 1.0, 2.0 * sin)
    return axis * angle[..., None]


def rot6d_to_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) continuous 6D rotation -> (..., 3, 3) via Gram-Schmidt."""
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / jnp.maximum(jnp.linalg.norm(a2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2).swapaxes(-1, -2)
