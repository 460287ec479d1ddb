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
    x1 = jnp.minimum(x0 + 1, Wt - 1)
    y1 = jnp.minimum(y0 + 1, Ht - 1)

    flat = tex.reshape(B, Ht * Wt, C)
    b_idx = jnp.arange(B).reshape((B,) + (1,) * (uv.ndim - 2))

    def fetch(yy, xx):
        return flat[b_idx, yy * Wt + xx]  # (B, ..., C)

    t00, t01 = fetch(y0, x0), fetch(y0, x1)
    t10, t11 = fetch(y1, x0), fetch(y1, x1)
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
