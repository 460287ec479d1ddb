"""Pallas TPU kernel: multisampled (MSAA) z-buffer face selection.

The reference supersamples: rasterise + shade at (3*224)^2, then 3x3
average-pool (models_res_nimble.py:74-77, 209-211).  That pays 9x the
shading/interpolation cost purely for edge anti-aliasing.  This kernel
instead evaluates the 3x3 subsample grid *inside* the rasteriser at base
resolution and outputs per-pixel:

  face_id  — nearest face over all subsamples (stable interior selection)
  coverage — fraction of the 9 subsamples covered by any face.  This equals
             the reference's avg-pooled alpha channel EXACTLY (the pooled
             alpha is exactly the covered-subsample fraction), so silhouettes
             are bit-comparable; only within-pixel shading variation differs.

Shading then runs once per output pixel (9x less interpolation/Phong work,
9x fewer scalar face-loop iterations than tiling the supersampled image).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tri_ref, fid_ref, zbuf_ref, cov_ref, *, tile: int, n_faces: int,
            samples: int):
    i = pl.program_id(1)
    j = pl.program_id(2)
    row0 = (i * tile).astype(jnp.float32)
    col0 = (j * tile).astype(jnp.float32)

    base_v = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0).astype(jnp.float32) + row0
    base_u = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1).astype(jnp.float32) + col0

    fid_ref[0] = jnp.full((tile, tile), -1, jnp.int32)
    zbuf_ref[0] = jnp.full((tile, tile), jnp.inf, jnp.float32)
    cov_ref[0] = jnp.zeros((tile, tile), jnp.int32)

    n_sub = samples * samples

    def body(f, carry):
        ax, ay, az = tri_ref[0, f, 0], tri_ref[0, f, 1], tri_ref[0, f, 2]
        bx, by, bz = tri_ref[0, f, 3], tri_ref[0, f, 4], tri_ref[0, f, 5]
        cx, cy, cz = tri_ref[0, f, 6], tri_ref[0, f, 7], tri_ref[0, f, 8]

        zvalid = jnp.minimum(jnp.minimum(az, bz), cz) > 1e-6
        umin = jnp.minimum(jnp.minimum(ax, bx), cx)
        umax = jnp.maximum(jnp.maximum(ax, bx), cx)
        vmin = jnp.minimum(jnp.minimum(ay, by), cy)
        vmax = jnp.maximum(jnp.maximum(ay, by), cy)
        overlap = (
            (umax >= col0)
            & (umin < col0 + tile)
            & (vmax >= row0)
            & (vmin < row0 + tile)
        )

        @pl.when(zvalid & overlap)
        def _():
            cov_bits = cov_ref[0]
            zb = zbuf_ref[0]
            fid = fid_ref[0]
            best_z = jnp.full((tile, tile), jnp.inf, jnp.float32)
            for sy in range(samples):
                for sx in range(samples):
                    u = base_u + (sx + 0.5) / samples
                    v = base_v + (sy + 0.5) / samples
                    e0 = (cx - bx) * (v - by) - (cy - by) * (u - bx)
                    e1 = (ax - cx) * (v - cy) - (ay - cy) * (u - cx)
                    e2 = (bx - ax) * (v - ay) - (by - ay) * (u - ax)
                    area = e0 + e1 + e2
                    area_ok = jnp.abs(area) > 1e-12
                    area_safe = jnp.where(area_ok, area, 1e-12)
                    w0, w1, w2 = e0 / area_safe, e1 / area_safe, e2 / area_safe
                    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & area_ok
                    z = w0 * az + w1 * bz + w2 * cz
                    s_idx = sy * samples + sx
                    cov_bits = jnp.where(inside, cov_bits | (1 << s_idx), cov_bits)
                    best_z = jnp.where(inside & (z < best_z), z, best_z)
            better = best_z < zb
            zbuf_ref[0] = jnp.where(better, best_z, zb)
            fid_ref[0] = jnp.where(better, jnp.full((tile, tile), f, jnp.int32), fid)
            cov_ref[0] = cov_bits

        return carry

    jax.lax.fori_loop(0, n_faces, body, None)

    # popcount of the coverage bitmask -> covered-subsample count
    bits = cov_ref[0]
    count = jnp.zeros_like(bits)
    for s in range(n_sub):
        count = count + ((bits >> s) & 1)
    cov_ref[0] = count


@functools.partial(
    jax.jit, static_argnames=("image_size", "tile", "samples", "interpret")
)
def rasterize_msaa_pallas(
    verts_screen: jnp.ndarray,  # (B, V, 3) [u, v, z] at BASE resolution
    faces: jnp.ndarray,
    image_size: int,
    tile: int = 128,
    samples: int = 3,
    interpret: bool = False,
):
    """Returns (face_id (B,S,S) int32, coverage (B,S,S) float in [0,1], zbuf)."""
    verts_screen = jax.lax.stop_gradient(verts_screen)
    B = verts_screen.shape[0]
    F = faces.shape[0]
    S = image_size
    S_pad = -(-S // tile) * tile

    tri = verts_screen[:, faces].reshape(B, F, 9).astype(jnp.float32)
    f_pad = (-F) % 8
    if f_pad:
        tri = jnp.concatenate([tri, jnp.zeros((B, f_pad, 9), jnp.float32)], axis=1)

    grid = (B, S_pad // tile, S_pad // tile)
    fid, zbuf, cov = pl.pallas_call(
        functools.partial(_kernel, tile=tile, n_faces=F, samples=samples),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tri.shape[1], 9), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, tile), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, tile), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, tile), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S_pad, S_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, S_pad, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, S_pad, S_pad), jnp.int32),
        ],
        interpret=interpret,
    )(tri)
    coverage = cov[:, :S, :S].astype(jnp.float32) / float(samples * samples)
    return fid[:, :S, :S], coverage, zbuf[:, :S, :S]
