"""Mesh helper ops for fixed-topology hand meshes.

The reference carries a PyTorch3D `Meshes` container; with a single static
topology (778- or 5990-vert hand) plain (B, V, 3) arrays + a static (F, 3)
faces array are sufficient and XLA-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU gathers/scatters of tiny (12-48 byte) rows cost ~100 ns of descriptor
# issue EACH — at batch 64 the (B, V, 3)[:, faces] corner gather alone was
# 29 ms of the raster forward.  Below this element-count limit the static
# topology is applied as a one-hot MATMUL instead (MXU, ~0.1 ms, and its
# transpose handles the backward scatter the same way).  MANO (3*1538*778 =
# 3.6M) uses the matmul; NIMBLE's 5990-vert mesh (214M) falls back to gather.
_ONEHOT_LIMIT = 8_000_000

# The selection matmuls MUST run at fp32 precision: jax's default TPU matmul
# precision is bfloat16, which would quantise screen coordinates to ~0.5 px
# at 224^2 (bf16 ulp at 224 is 1.0) and visibly shift rasterised faces.  The
# one-hot operand is exact, so HIGHEST makes the "gather" bit-exact.
_EXACT = jax.lax.Precision.HIGHEST


def _corner_onehot(faces: jnp.ndarray, n_verts: int, dtype) -> jnp.ndarray:
    """(3F, V) one-hot corner-selection matrix, built in-graph (fused compare
    — never an HLO constant)."""
    flat = faces.reshape(-1)
    return (flat[:, None] == jnp.arange(n_verts)[None, :]).astype(dtype)


def gather_face_rows(x: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """x (B, V, D), faces (F, 3) -> (B, F, 3D) packed corner rows
    [a_0..a_D b_0..b_D c_0..c_D]."""
    B, V, D = x.shape
    F = faces.shape[0]
    if 3 * F * V <= _ONEHOT_LIMIT:
        sel = _corner_onehot(faces, V, x.dtype)
        return jnp.einsum("fv,bvd->bfd", sel, x, precision=_EXACT).reshape(B, F, 3 * D)
    if jax.default_backend() == "tpu" and x.dtype == jnp.float32:
        # large meshes (NIMBLE ~10k faces): blocked one-hot matmul gather —
        # the static (3F, V) matrix above would be too big an HLO constant,
        # but the dynamic-index kernel builds its one-hot blocks in VMEM
        from hifihr_tpu.render.gather_mxu import gather_rows

        idx = jnp.broadcast_to(faces.reshape(-1)[None], (B, 3 * F)).astype(jnp.int32)
        return gather_rows(x, idx).reshape(B, F, 3 * D)
    return x[:, faces].reshape(B, F, 3 * D)


def face_vertices(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """verts (B, V, D), faces (F, 3) -> (B, F, 3, D)."""
    B, V, D = verts.shape
    return gather_face_rows(verts, faces).reshape(B, faces.shape[0], 3, D)


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Unnormalised face normals: (B, F, 3)."""
    tri = face_vertices(verts, faces)
    return jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals, (B, V, 3), unit length.

    Differentiable w.r.t. verts.  Face-normal accumulation onto vertices is
    the transpose of the corner selection: one matmul with the (V, F)
    incidence matrix on small meshes, XLA scatter-add on large ones.
    """
    import jax

    fn = face_normals(verts, faces)  # (B, F, 3)
    V = verts.shape[1]
    F = faces.shape[0]
    if 3 * F * V <= _ONEHOT_LIMIT:
        inc = _corner_onehot(faces, V, fn.dtype)  # (3F, V)
        inc = inc.reshape(F, 3, V).sum(1)  # (F, V) corner counts
        v_normals = jnp.einsum("fv,bfd->bvd", inc, fn, precision=_EXACT)
    else:
        v_normals = jnp.zeros_like(verts)
        for k in range(3):
            v_normals = v_normals.at[:, faces[:, k]].add(fn)
    # eps inside the sqrt: finite gradient for degenerate (zero-normal) verts
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


def vertex_tangents(verts: jnp.ndarray, faces: jnp.ndarray,
                    face_uv: jnp.ndarray) -> jnp.ndarray:
    """UV-aligned per-vertex tangents, (B, V, 3), unit length.

    Per-face tangent T solves [e1; e2] = [duv1; duv2] @ [T; Bt] for the
    positional edges e and UV edges duv (the standard normal-mapping frame);
    accumulation onto vertices reuses the incidence-matmul path of
    vertex_normals.  Consumed by phong_shade's tangent-space normal maps
    (NIMBLE appearance: PCA diffuse/normal/spec UV maps, SURVEY §2.1).
    """
    import jax

    v0 = verts[:, faces[:, 0]]
    e1 = verts[:, faces[:, 1]] - v0  # (B, F, 3)
    e2 = verts[:, faces[:, 2]] - v0
    duv1 = face_uv[:, 1] - face_uv[:, 0]  # (F, 2)
    duv2 = face_uv[:, 2] - face_uv[:, 0]
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    r = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    t_face = (e1 * duv2[None, :, 1, None] - e2 * duv1[None, :, 1, None]) * r[None, :, None]

    V = verts.shape[1]
    F = faces.shape[0]
    if 3 * F * V <= _ONEHOT_LIMIT:
        inc = _corner_onehot(faces, V, t_face.dtype)
        inc = inc.reshape(F, 3, V).sum(1)
        v_t = jnp.einsum("fv,bfd->bvd", inc, t_face, precision=_EXACT)
    else:
        v_t = jnp.zeros_like(verts)
        for k in range(3):
            v_t = v_t.at[:, faces[:, k]].add(t_face)
    return v_t * jax.lax.rsqrt(jnp.sum(v_t * v_t, axis=-1, keepdims=True) + 1e-12)
