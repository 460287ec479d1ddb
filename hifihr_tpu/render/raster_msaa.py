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

Layout (the perf-critical part, measured on v5e): face data is packed
8 faces x 16 floats into 128-lane rows, so both the host-side binning gather
and the kernel's per-program block DMA move contiguous 512-byte lane-aligned
rows.  The earlier one-face-per-row (n_bin, 16) layout forced Mosaic into a
64-byte strided transfer per face — DMA descriptor issue dominated the whole
kernel (~80 ms of a 104 ms forward at batch 64; this layout is ~20x less
descriptor traffic).

Binning: the host computes only per-tile COMPACTED INDEX LISTS into the
per-image packed table (row bbox = union of its 8 faces' bboxes) — no
face-data gather at all.  The table block's index map is constant across a
tile sweep, so Mosaic ships it to VMEM once per image and elides the
repeated DMAs; the index lists ride in SMEM, where dynamic scalar reads are
free.  The kernel walks its list with an early-exit while_loop (valid
indices first, -1 padded), reads face rows at *dynamic sublane* indices
(allowed; dynamic lane indexing is not) and processes the row's 8 faces at
static lane offsets; all-zero face slots self-neutralise (area == 0), so
empty tiles cost ~nothing and busy tiles only touch overlapping rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOT = 16  # floats per face: [ax ay az bx by bz cx cy cz fid 0...]
_PACK = 8  # faces per 128-lane row


def _kernel(idx_ref, tab_ref, fid_ref, zbuf_ref, cov_ref, *, tile_h: int,
            tile_w: int, n_rowbin: int, samples: int):
    i = pl.program_id(1)
    j = pl.program_id(2)
    row0 = (i * tile_h).astype(jnp.float32)
    col0 = (j * tile_w).astype(jnp.float32)
    shape = (tile_h, tile_w)

    base_v = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32) + row0
    base_u = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32) + col0

    fid_ref[0, 0] = jnp.full(shape, -1, jnp.int32)
    zbuf_ref[0, 0] = jnp.full(shape, jnp.inf, jnp.float32)
    cov_ref[0, 0] = jnp.zeros(shape, jnp.int32)

    n_sub = samples * samples
    step = 1.0 / samples

    def cond(k):
        # the per-tile index list is -1 padded past its valid prefix
        return jnp.logical_and(k < n_rowbin, idx_ref[0, 0, 0, k] >= 0)

    def body(k):
        r = idx_ref[0, 0, 0, k]  # SMEM scalar: which packed face-row to process
        cov_bits = cov_ref[0, 0]
        zb = zbuf_ref[0, 0]
        fid = fid_ref[0, 0]
        for s in range(_PACK):  # static lane offsets within the 128-lane row
            o = s * _SLOT
            ax, ay, az = tab_ref[0, r, o + 0], tab_ref[0, r, o + 1], tab_ref[0, r, o + 2]
            bx, by, bz = tab_ref[0, r, o + 3], tab_ref[0, r, o + 4], tab_ref[0, r, o + 5]
            cx, cy, cz = tab_ref[0, r, o + 6], tab_ref[0, r, o + 7], tab_ref[0, r, o + 8]
            f = tab_ref[0, r, o + 9].astype(jnp.int32)

            # the barycentric denominator e0+e1+e2 is the (constant) signed
            # face area: hoist it to SCALARS — no per-pixel divisions,
            # inside-test via sign(area)-premultiplied edge functions.
            # All-zero slots (padding / culled faces) give area == 0 ->
            # area_ok False -> no subsample passes: self-neutralising.
            area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            area_ok = jnp.logical_and(jnp.abs(area) > 1e-12, az > 1e-6)
            inv_area = jnp.where(area_ok, 1.0 / jnp.where(area_ok, area, 1.0), 0.0)
            sgn = jnp.where(area < 0, -1.0, 1.0)

            # edge coefficients: e(u, v) = eu*u + ev*v + ec
            e0u, e0v = -(cy - by), (cx - bx)
            e0c = -(cx - bx) * by + (cy - by) * bx
            e1u, e1v = -(ay - cy), (ax - cx)
            e1c = -(ax - cx) * cy + (ay - cy) * cx
            e2u, e2v = -(by - ay), (bx - ax)
            e2c = -(bx - ax) * ay + (by - ay) * ax

            best_z = jnp.full(shape, jnp.inf, jnp.float32)
            e0_00 = e0u * (base_u + 0.5 * step) + e0v * (base_v + 0.5 * step) + e0c
            e1_00 = e1u * (base_u + 0.5 * step) + e1v * (base_v + 0.5 * step) + e1c
            e2_00 = e2u * (base_u + 0.5 * step) + e2v * (base_v + 0.5 * step) + e2c
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
            zb = jnp.where(better, best_z, zb)
            fid = jnp.where(better, jnp.broadcast_to(f, shape), fid)
        zbuf_ref[0, 0] = zb
        fid_ref[0, 0] = fid
        cov_ref[0, 0] = cov_bits
        return k + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))

    # popcount of the coverage bitmask -> covered-subsample count
    bits = cov_ref[0, 0]
    count = jnp.zeros_like(bits)
    for s in range(n_sub):
        count = count + ((bits >> s) & 1)
    cov_ref[0, 0] = count


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

    from hifihr_tpu.render.mesh import gather_face_rows

    tri = gather_face_rows(verts_screen, faces).astype(jnp.float32)  # (B,F,9)
    zok = jnp.min(tri[:, :, 2::3], axis=-1) > 1e-6
    tri = jnp.where(zok[..., None], tri, 0.0)  # cull once; zero slots are inert

    # pack 8 faces x 16 floats into one 128-lane row (contiguous DMA unit)
    n_rows = -(-F // _PACK)
    F8 = n_rows * _PACK
    slot = jnp.concatenate(
        [
            tri,
            jnp.broadcast_to(jnp.arange(F, dtype=jnp.float32)[None, :, None], (B, F, 1)),
            jnp.zeros((B, F, _SLOT - 10), jnp.float32),
        ],
        axis=-1,
    )  # (B, F, 16)
    slot = jnp.pad(slot, ((0, 0), (0, F8 - F), (0, 0)))
    packed = slot.reshape(B, n_rows, _PACK * _SLOT)
    n_rows_pad = -(-n_rows // 8) * 8
    packed = jnp.pad(packed, ((0, 0), (0, n_rows_pad - n_rows), (0, 0)))

    # host-side binning at ROW granularity: row bbox = union of its 8 faces
    # (invalid faces were zeroed -> excluded via +/-inf substitution)
    inf = jnp.float32(jnp.inf)
    fu = tri[:, :, 0::3]
    fv = tri[:, :, 1::3]
    fumin = jnp.where(zok[..., None], fu, inf).min(-1)
    fumax = jnp.where(zok[..., None], fu, -inf).max(-1)
    fvmin = jnp.where(zok[..., None], fv, inf).min(-1)
    fvmax = jnp.where(zok[..., None], fv, -inf).max(-1)

    def rmin(x):
        return jnp.pad(x, ((0, 0), (0, F8 - F)), constant_values=jnp.inf).reshape(
            B, n_rows, _PACK
        ).min(-1)

    def rmax(x):
        return jnp.pad(x, ((0, 0), (0, F8 - F)), constant_values=-jnp.inf).reshape(
            B, n_rows, _PACK
        ).max(-1)

    umin, umax = rmin(fumin), rmax(fumax)
    vmin, vmax = rmin(fvmin), rmax(fvmax)

    tx = jnp.arange(ntx, dtype=jnp.float32) * tile
    ty = jnp.arange(nty, dtype=jnp.float32) * tile_h
    ov_u = (umax[:, None, :] >= tx[None, :, None]) & (
        umin[:, None, :] < tx[None, :, None] + tile
    )  # (B, ntx, n_rows)
    ov_v = (vmax[:, None, :] >= ty[None, :, None]) & (
        vmin[:, None, :] < ty[None, :, None] + tile_h
    )  # (B, nty, n_rows)
    overlap = (
        ov_v[:, :, None, :] & ov_u[:, None, :, :]
    ).reshape(B, nty * ntx, n_rows)

    n_rowbin = -(-(n_rows + 1) // 8) * 8  # +1 guarantees a -1 sentinel slot

    # per-tile compacted index lists ONLY — no face-data gather at all.  The
    # packed per-image table ships to the kernel once (its block index is
    # constant across a tile row/column sweep, so Mosaic elides the repeated
    # DMA); indices ride in SMEM where dynamic scalar reads are free.
    idx = jax.vmap(
        lambda m: jnp.where(m, size=n_rowbin, fill_value=-1)[0].astype(jnp.int32)
    )(overlap.reshape(B * nty * ntx, n_rows)).reshape(B, nty * ntx, 1, n_rowbin)

    # outputs in TILE-MAJOR layout: each program writes one contiguous
    # (tile_h * tile) block — a (tile_h, tile) window of a W_pad-wide image
    # would be tile_h separate strided descriptors per output per program,
    # which dominated the empty-scene cost.  One cheap XLA transpose
    # reassembles the image afterwards.
    grid = (B, nty, ntx)
    tile_block = pl.BlockSpec(
        (1, 1, tile_h, tile),
        lambda b, i, j, _ntx=ntx: (b, i * _ntx + j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    fid, zbuf, cov = pl.pallas_call(
        functools.partial(
            _kernel, tile_h=tile_h, tile_w=tile, n_rowbin=n_rowbin, samples=samples
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, n_rowbin),
                lambda b, i, j, _ntx=ntx: (b, i * _ntx + j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n_rows_pad, _PACK * _SLOT),
                lambda b, i, j: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[tile_block, tile_block, tile_block],
        out_shape=[
            jax.ShapeDtypeStruct((B, nty * ntx, tile_h, tile), jnp.int32),
            jax.ShapeDtypeStruct((B, nty * ntx, tile_h, tile), jnp.float32),
            jax.ShapeDtypeStruct((B, nty * ntx, tile_h, tile), jnp.int32),
        ],
        interpret=interpret,
    )(idx, packed)

    def assemble(t):
        img = t.reshape(B, nty, ntx, tile_h, tile).transpose(0, 1, 3, 2, 4)
        return img.reshape(B, H_pad, W_pad)[:, :S, :S]

    fid, zbuf, cov = assemble(fid), assemble(zbuf), assemble(cov)
    coverage = cov.astype(jnp.float32) / float(samples * samples)
    return fid, coverage, zbuf
