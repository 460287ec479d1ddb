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

Shading then runs once per output pixel (9x less interpolation/Phong work).

Binning: faces are bucketed per pixel tile on the host (bbox/tile overlap)
and their vertex data gathered into a per-tile table — valid rows first, a
z=0 sentinel row marking the end.  The kernel walks its tile's table with an
early-exit while_loop over *sequential sublane rows* (Mosaic allows dynamic
sublane indexing but not dynamic lane indexing), so empty tiles cost ~nothing
and busy tiles only touch overlapping faces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW = 16  # padded row: [ax ay az bx by bz cx cy cz face_id 0...]


def _kernel(tab_ref, fid_ref, zbuf_ref, cov_ref, *, tile_h: int, tile_w: int,
            n_bin: int, samples: int, faces_per_iter: int = 2):
    i = pl.program_id(1)
    j = pl.program_id(2)
    row0 = (i * tile_h).astype(jnp.float32)
    col0 = (j * tile_w).astype(jnp.float32)
    shape = (tile_h, tile_w)

    base_v = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32) + row0
    base_u = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32) + col0

    fid_ref[0] = jnp.full(shape, -1, jnp.int32)
    zbuf_ref[0] = jnp.full(shape, jnp.inf, jnp.float32)
    cov_ref[0] = jnp.zeros(shape, jnp.int32)

    n_sub = samples * samples

    def cond(k):
        # sentinel rows have z == 0 (valid faces require z > 1e-6)
        return jnp.logical_and(k < n_bin, tab_ref[0, 0, k, 2] > 1e-6)

    def process(k):
        ax, ay, az = tab_ref[0, 0, k, 0], tab_ref[0, 0, k, 1], tab_ref[0, 0, k, 2]
        bx, by, bz = tab_ref[0, 0, k, 3], tab_ref[0, 0, k, 4], tab_ref[0, 0, k, 5]
        cx, cy, cz = tab_ref[0, 0, k, 6], tab_ref[0, 0, k, 7], tab_ref[0, 0, k, 8]
        f = tab_ref[0, 0, k, 9].astype(jnp.int32)

        # the barycentric denominator e0+e1+e2 is the (constant) signed face
        # area: hoist it to SCALARS — no per-pixel divisions, inside-test via
        # sign(area)-premultiplied edge functions (exactly equivalent)
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        area_ok = jnp.abs(area) > 1e-12
        inv_area = jnp.where(area_ok, 1.0 / jnp.where(area_ok, area, 1.0), 0.0)
        sgn = jnp.where(area < 0, -1.0, 1.0)

        # edge coefficients: e(u, v) = eu*u + ev*v + ec, e.g.
        # e0 = (cx-bx)(v-by) - (cy-by)(u-bx)
        e0u, e0v = -(cy - by), (cx - bx)
        e0c = -(cx - bx) * by + (cy - by) * bx
        e1u, e1v = -(ay - cy), (ax - cx)
        e1c = -(ax - cx) * cy + (ay - cy) * cx
        e2u, e2v = -(by - ay), (bx - ax)
        e2c = -(bx - ax) * ay + (by - ay) * ax

        cov_bits = cov_ref[0]
        zb = zbuf_ref[0]
        fid = fid_ref[0]
        best_z = jnp.full(shape, jnp.inf, jnp.float32)
        # base-subsample edge values; per-subsample updates are 2 madds each
        e0_00 = e0u * (base_u + 0.5 / samples) + e0v * (base_v + 0.5 / samples) + e0c
        e1_00 = e1u * (base_u + 0.5 / samples) + e1v * (base_v + 0.5 / samples) + e1c
        e2_00 = e2u * (base_u + 0.5 / samples) + e2v * (base_v + 0.5 / samples) + e2c
        step = 1.0 / samples
        for sy in range(samples):
            for sx in range(samples):
                d = sx * step
                dv = sy * step
                e0 = e0_00 + e0u * d + e0v * dv
                e1 = e1_00 + e1u * d + e1v * dv
                e2 = e2_00 + e2u * d + e2v * dv
                inside = (
                    (sgn * e0 >= 0) & (sgn * e1 >= 0) & (sgn * e2 >= 0) & area_ok
                )
                z = (e0 * az + e1 * bz + e2 * cz) * inv_area
                s_idx = sy * samples + sx
                cov_bits = jnp.where(inside, cov_bits | (1 << s_idx), cov_bits)
                best_z = jnp.where(inside & (z < best_z), z, best_z)
        better = best_z < zb
        zbuf_ref[0] = jnp.where(better, best_z, zb)
        fid_ref[0] = jnp.where(better, jnp.broadcast_to(f, shape), fid)
        cov_ref[0] = cov_bits

    def body(k):
        # unrolled pair: halves while_loop/cond overhead and lets the two
        # faces' scalar table loads overlap the vector work.  Sentinel rows
        # (all zeros) are self-neutralising: area == 0 -> area_ok False ->
        # no subsample passes the inside test, so no guard is needed for the
        # second slot, and n_bin is a multiple of 8 so k+1 stays in range.
        for d in range(faces_per_iter):
            process(k + d)
        return k + faces_per_iter

    jax.lax.while_loop(cond, body, jnp.int32(0))

    # popcount of the coverage bitmask -> covered-subsample count
    bits = cov_ref[0]
    count = jnp.zeros_like(bits)
    for s in range(n_sub):
        count = count + ((bits >> s) & 1)
    cov_ref[0] = count


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "tile", "tile_h", "samples", "interpret"),
)
def rasterize_msaa_pallas(
    verts_screen: jnp.ndarray,  # (B, V, 3) [u, v, z] at BASE resolution
    faces: jnp.ndarray,
    image_size: int,
    tile: int = 128,  # tile width (lane dim; multiples of 128)
    tile_h: int = 32,  # tile height (sublane dim); small tiles => tight bins
    samples: int = 3,
    interpret: bool = False,
):
    """Returns (face_id (B,S,S) int32, coverage (B,S,S) float in [0,1], zbuf)."""
    verts_screen = jax.lax.stop_gradient(verts_screen)
    B = verts_screen.shape[0]
    F = faces.shape[0]
    S = image_size
    W_pad = -(-S // tile) * tile
    H_pad = -(-S // tile_h) * tile_h
    ntx = W_pad // tile
    nty = H_pad // tile_h

    tri = verts_screen[:, faces].reshape(B, F, 9).astype(jnp.float32)
    n_bin = -(-(F + 1) // 8) * 8  # +1 guarantees room for a sentinel row

    # host-side binning: per (image, tile) gather of bbox-overlapping faces
    umin = jnp.min(tri[:, :, 0::3], axis=-1)  # (B, F)
    umax = jnp.max(tri[:, :, 0::3], axis=-1)
    vmin = jnp.min(tri[:, :, 1::3], axis=-1)
    vmax = jnp.max(tri[:, :, 1::3], axis=-1)
    zok = jnp.min(tri[:, :, 2::3], axis=-1) > 1e-6

    tx = jnp.arange(ntx, dtype=jnp.float32) * tile
    ty = jnp.arange(nty, dtype=jnp.float32) * tile_h
    ov_u = (umax[:, None, :] >= tx[None, :, None]) & (
        umin[:, None, :] < tx[None, :, None] + tile
    )  # (B, ntx, F)
    ov_v = (vmax[:, None, :] >= ty[None, :, None]) & (
        vmin[:, None, :] < ty[None, :, None] + tile_h
    )  # (B, nty, F)
    overlap = (
        ov_v[:, :, None, :] & ov_u[:, None, :, :] & zok[:, None, None, :]
    ).reshape(B * nty * ntx, F)

    row = jnp.concatenate(
        [
            tri,
            jnp.broadcast_to(jnp.arange(F, dtype=jnp.float32)[None, :, None], (B, F, 1)),
            jnp.zeros((B, F, _ROW - 10), jnp.float32),
        ],
        axis=-1,
    )  # (B, F, 16)

    def bin_one(mask, rows):
        idx = jnp.where(mask, size=n_bin, fill_value=-1)[0]
        gathered = rows[jnp.maximum(idx, 0)]
        return jnp.where((idx >= 0)[:, None], gathered, 0.0)

    rows_rep = jnp.broadcast_to(
        row[:, None], (B, nty * ntx, F, _ROW)
    ).reshape(B * nty * ntx, F, _ROW)
    tab = jax.vmap(bin_one)(overlap, rows_rep).reshape(B, nty * ntx, n_bin, _ROW)

    grid = (B, nty, ntx)
    fid, zbuf, cov = pl.pallas_call(
        functools.partial(
            _kernel, tile_h=tile_h, tile_w=tile, n_bin=n_bin, samples=samples
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, n_bin, _ROW),
                lambda b, i, j, _ntx=ntx: (b, i * _ntx + j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, tile), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, tile), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, tile), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H_pad, W_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, H_pad, W_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, H_pad, W_pad), jnp.int32),
        ],
        interpret=interpret,
    )(tab)
    coverage = cov[:, :S, :S].astype(jnp.float32) / float(samples * samples)
    return fid[:, :S, :S], coverage, zbuf[:, :S, :S]
