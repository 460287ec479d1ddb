"""Mesh helper ops for fixed-topology hand meshes.

The reference carries a PyTorch3D `Meshes` container; with a single static
topology (778- or 5990-vert hand) plain (B, V, 3) arrays + a static (F, 3)
faces array are sufficient and XLA-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def face_vertices(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """verts (B, V, D), faces (F, 3) -> (B, F, 3, D)."""
    return verts[:, faces]


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Unnormalised face normals: (B, F, 3)."""
    tri = face_vertices(verts, faces)
    return jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals, (B, V, 3), unit length.

    Differentiable w.r.t. verts; scatter-add over the static topology compiles
    to an efficient XLA scatter.
    """
    fn = face_normals(verts, faces)  # (B, F, 3)
    v_normals = jnp.zeros_like(verts)
    for k in range(3):
        v_normals = v_normals.at[:, faces[:, k]].add(fn)
    # eps inside the sqrt: finite gradient for degenerate (zero-normal) verts
    import jax

    return v_normals * jax.lax.rsqrt(
        jnp.sum(v_normals * v_normals, axis=-1, keepdims=True) + 1e-20
    )


def uniform_laplacian(num_verts: int, faces) -> jnp.ndarray:
    """Dense uniform Laplacian L (V, V): (L @ v)_i = mean_{j in N(i)} v_j - v_i.

    Fixed topology => precompute once; `L @ verts` replaces PyTorch3D's
    mesh_laplacian_smoothing sparse pipeline (reference utils/losses_util.py:
    340-364).  778/5990 verts make the dense matmul trivial on the MXU.
    """
    import numpy as np

    faces = np.asarray(faces)
    adj = np.zeros((num_verts, num_verts), np.float32)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        adj[faces[:, a], faces[:, b]] = 1.0
        adj[faces[:, b], faces[:, a]] = 1.0
    deg = adj.sum(1)
    inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    lap = adj * inv_deg[:, None] - np.diag((deg > 0).astype(np.float32))
    return jnp.asarray(lap)
