"""Pallas TPU kernel: z-buffer triangle face-selection.

The TPU replacement for PyTorch3D's CUDA `rasterize_meshes` hot loop.  Each
grid instance owns one (TILE x TILE) pixel tile of one batch image, held in
VMEM; it loops over faces, skipping whole tiles per face via a scalar
bbox test (`pl.when`), and evaluates the three edge functions vectorised over
the tile on the VPU.  Outputs are per-pixel nearest face id + depth.

The kernel is intentionally *not* differentiable: gradients are produced by
the differentiable barycentric recompute in hifihr_tpu.render.interpolate
(see raster_jax.py docstring).  Output semantics match
`raster_jax.rasterize_face_id` (tie-break: lowest face index at equal depth),
verified by a parity test running this kernel in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tri_ref, fid_ref, zbuf_ref, *, tile: int, n_faces: int):
    i = pl.program_id(1)
    j = pl.program_id(2)
    row0 = (i * tile).astype(jnp.float32)
    col0 = (j * tile).astype(jnp.float32)

    # TPU iota must be integer-typed; cast to f32 after
    v = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0).astype(jnp.float32) + row0 + 0.5
    u = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1).astype(jnp.float32) + col0 + 0.5

    fid_ref[0] = jnp.full((tile, tile), -1, jnp.int32)
    zbuf_ref[0] = jnp.full((tile, tile), jnp.inf, jnp.float32)

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
            e0 = (cx - bx) * (v - by) - (cy - by) * (u - bx)
            e1 = (ax - cx) * (v - cy) - (ay - cy) * (u - cx)
            e2 = (bx - ax) * (v - ay) - (by - ay) * (u - ax)
            area = e0 + e1 + e2
            area_ok = jnp.abs(area) > 1e-12
            area_safe = jnp.where(area_ok, area, 1e-12)
            w0, w1, w2 = e0 / area_safe, e1 / area_safe, e2 / area_safe
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & area_ok
            z = w0 * az + w1 * bz + w2 * cz
            zb = zbuf_ref[0]
            better = inside & (z < zb)
            zbuf_ref[0] = jnp.where(better, z, zb)
            fid_ref[0] = jnp.where(better, jnp.full((tile, tile), f, jnp.int32), fid_ref[0])

        return carry

    jax.lax.fori_loop(0, n_faces, body, None)


@functools.partial(jax.jit, static_argnames=("image_size", "tile", "interpret"))
def rasterize_face_id_pallas(
    verts_screen: jnp.ndarray,  # (B, V, 3) [u, v, z]
    faces: jnp.ndarray,  # (F, 3) int32
    image_size: int,
    tile: int = 128,
    interpret: bool = False,
):
    """Same contract as raster_jax.rasterize_face_id: (face_id, zbuf)."""
    verts_screen = jax.lax.stop_gradient(verts_screen)
    B = verts_screen.shape[0]
    F = faces.shape[0]
    S = image_size
    S_pad = -(-S // tile) * tile

    tri = verts_screen[:, faces].reshape(B, F, 9).astype(jnp.float32)
    # pad faces to a sublane multiple with invalid (z<=0) faces
    f_pad = (-F) % 8
    if f_pad:
        tri = jnp.concatenate([tri, jnp.zeros((B, f_pad, 9), jnp.float32)], axis=1)

    grid = (B, S_pad // tile, S_pad // tile)
    fid, zbuf = pl.pallas_call(
        functools.partial(_kernel, tile=tile, n_faces=F),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tri.shape[1], 9),
                lambda b, i, j: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, tile), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, tile), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S_pad, S_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, S_pad, S_pad), jnp.float32),
        ],
        interpret=interpret,
    )(tri)
    return fid[:, :S, :S], zbuf[:, :S, :S]
