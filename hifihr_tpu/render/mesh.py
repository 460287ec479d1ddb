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


_INC_CACHE: dict = {}


def _corner_incidence(faces, n_verts: int) -> jnp.ndarray:
    """(F, V) corner-count incidence in bf16 (entries 0-3 — exact in bf16),
    host-built once per topology and cached as a device constant.  Streaming
    it through one MXU matmul replaces the per-corner scatter-add."""
    import numpy as np

    import ml_dtypes

    f = np.asarray(faces)
    key = (f.shape[0], int(n_verts), hash(f.tobytes()))
    if key not in _INC_CACHE:
        inc = np.zeros((f.shape[0], n_verts), np.float32)
        np.add.at(inc, (np.repeat(np.arange(f.shape[0]), 3), f.reshape(-1)), 1.0)
        # cache NUMPY (bf16), not a device array: a jnp constant created
        # inside a trace is a tracer — caching it across traces leaks
        _INC_CACHE[key] = inc.astype(ml_dtypes.bfloat16)
    return jnp.asarray(_INC_CACHE[key])


def accumulate_corners(per_face: jnp.ndarray, faces, n_verts: int) -> jnp.ndarray:
    """Sum per-face values into the face's 3 corner vertices:
    (B, F, D) -> (B, V, D).  Small meshes: exact one-hot matmul.  Large
    meshes (NIMBLE): bf16 incidence matmul with B*D as the MXU N dim — the
    N=D form wastes 95% of the systolic array at D~6, and XLA's scatter-add
    lowering (the old path) serialized into ~15 ms of the corner-shade
    stage.  bf16 value rounding (~0.4%) is fine for every consumer here
    (normals/tangents are renormalised downstream)."""
    B, F, D = per_face.shape
    if 3 * F * n_verts <= _ONEHOT_LIMIT:
        inc = _corner_onehot(faces, n_verts, per_face.dtype)
        inc = inc.reshape(F, 3, n_verts).sum(1)
        return jnp.einsum("fv,bfd->bvd", inc, per_face, precision=_EXACT)
    try:
        inc = _corner_incidence(faces, n_verts)
    except Exception:  # traced faces (never in practice): serial fallback
        out = jnp.zeros((B, n_verts, D), per_face.dtype)
        for k in range(3):
            out = out.at[:, faces[:, k]].add(per_face)
        return out
    vals = per_face.astype(jnp.bfloat16).transpose(1, 0, 2).reshape(F, B * D)
    out = jnp.einsum("fv,fn->vn", inc, vals,
                     preferred_element_type=jnp.float32)
    return out.reshape(n_verts, B, D).transpose(1, 0, 2)


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
    v_normals = accumulate_corners(fn, faces, verts.shape[1])
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

    tri = face_vertices(verts, faces)  # (B, F, 3, 3) — one MXU corner gather
    t_face = _face_tangents(tri, face_uv)
    v_t = accumulate_corners(t_face, faces, verts.shape[1])
    return v_t * jax.lax.rsqrt(jnp.sum(v_t * v_t, axis=-1, keepdims=True) + 1e-12)


def _face_tangents(tri: jnp.ndarray, face_uv: jnp.ndarray) -> jnp.ndarray:
    """Per-face UV-aligned tangent from gathered corners tri (B, F, 3, 3)."""
    e1 = tri[:, :, 1] - tri[:, :, 0]  # (B, F, 3)
    e2 = tri[:, :, 2] - tri[:, :, 0]
    duv1 = face_uv[:, 1] - face_uv[:, 0]  # (F, 2)
    duv2 = face_uv[:, 2] - face_uv[:, 0]
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    r = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return (e1 * duv2[None, :, 1, None] - e2 * duv1[None, :, 1, None]) * r[None, :, None]


def vertex_normals_and_tangents(verts: jnp.ndarray, faces: jnp.ndarray,
                                face_uv: jnp.ndarray):
    """Fused (vertex_normals, vertex_tangents): ONE corner gather of verts +
    ONE corner accumulation for both 3-channel fields (the renderer's
    with-normal-maps path needs both every step; separately they each paid a
    gather and a scatter)."""
    import jax

    tri = face_vertices(verts, faces)  # (B, F, 3, 3)
    fn = jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])
    t_face = _face_tangents(tri, face_uv)
    acc = accumulate_corners(
        jnp.concatenate([fn, t_face], axis=-1), faces, verts.shape[1])
    vn, vt = acc[..., :3], acc[..., 3:]

    def unit(x, eps):
        return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)

    return unit(vn, 1e-20), unit(vt, 1e-12)
