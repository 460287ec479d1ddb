"""UV texture sampling (differentiable, TPU-friendly).

The reference's NIMBLE appearance model renders PCA UV diffuse maps through
textured PyTorch3D Meshes (models_res_nimble.py:132-142).  Here the fragment
pipeline interpolates per-vertex UVs (through the same packed-row gather as
every other attribute) and bilinearly samples a per-batch texture image.
Gradients flow to the texture image (and so to the PCA texture coefficients)
via the gather's scatter-add transpose, and to the mesh through the
barycentrics — the same trainability the reference relies on.

Sampling gathers rows of the flattened (B, H*W, C) texture — one linear index
per corner — rather than 2-D advanced indexing, which XLA lowers much better
on TPU (see render/interpolate.py's packed-row rationale).
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_texture(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample: tex (B, Ht, Wt, C), uv (..., 2) in [0, 1] -> (B, ..., C).

    uv convention: u -> x (width), v -> y (height), origin top-left (matches
    the OBJ `vt` convention after the exporter's v-flip).  Out-of-range uv are
    clamped to the border.
    """
    B, Ht, Wt, C = tex.shape
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (Wt - 1)
    y = jnp.clip(uv[..., 1], 0.0, 1.0) * (Ht - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    # pre-pack the 2x2 texel quad per texel (edge-clamped shifts) so each
    # pixel needs ONE row gather of 4C floats instead of four C-float
    # gathers — TPU gathers pay per-descriptor, not per-byte.  The backward
    # scatters into the quad and the shift transposes accumulate into the
    # texture automatically.
    sx = jnp.concatenate([tex[:, :, 1:], tex[:, :, -1:]], axis=2)  # t(y, x+1)
    sy = jnp.concatenate([tex[:, 1:], tex[:, -1:]], axis=1)        # t(y+1, x)
    sxy = jnp.concatenate([sx[:, 1:], sx[:, -1:]], axis=1)         # t(y+1, x+1)
    quad = jnp.concatenate([tex, sx, sy, sxy], axis=-1)  # (B, Ht, Wt, 4C)
    flat = quad.reshape(B, Ht * Wt, 4 * C)
    b_idx = jnp.arange(B).reshape((B,) + (1,) * (uv.ndim - 2))
    q = flat[b_idx, y0 * Wt + x0]  # (B, ..., 4C)

    t00, t01 = q[..., 0:C], q[..., C:2 * C]
    t10, t11 = q[..., 2 * C:3 * C], q[..., 3 * C:]
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def cylindrical_uv(verts: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Placeholder-grade UV chart: cylindrical unwrap around `axis`.

    u = atan2 angle (seam at -x), v = normalized height along the axis.  The
    real NIMBLE release ships an artist UV atlas; this generates a usable
    injective-almost-everywhere chart for the derived mesh (one seam line of
    faces interpolates across the wrap — documented placeholder limitation).
    verts: (V, 3) template-pose vertices -> (V, 2) in [0, 1].
    """
    other = [a for a in range(3) if a != axis]
    x = verts[:, other[0]]
    z = verts[:, other[1]]
    h = verts[:, axis]
    u = (jnp.arctan2(z, x) / (2.0 * jnp.pi)) + 0.5
    v = (h - h.min()) / jnp.maximum(h.max() - h.min(), 1e-8)
    return jnp.stack([u, v], axis=-1)
