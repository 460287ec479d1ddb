"""Pallas TPU kernel: multisampled (MSAA) z-buffer face selection.

The reference supersamples: rasterise + shade at (3*224)^2, then 3x3
average-pool (models_res_nimble.py:74-77, 209-211).  That pays 9x the
shading/interpolation cost purely for edge anti-aliasing.  This kernel
instead evaluates the 3x3 subsample grid *inside* the rasteriser at base
resolution and outputs per-pixel:

  face_id  — face with the nearest affine z-plane at the PIXEL CENTER among
             faces covering any subsample (standard MSAA depth resolve;
             PyTorch3D's per-pixel z-test is center-based too)
  coverage — fraction of the 9 subsamples covered by any face.  This equals
             the reference's avg-pooled alpha channel EXACTLY (the pooled
             alpha is exactly the covered-subsample fraction), so silhouettes
             are bit-comparable; only within-pixel shading variation differs.

Shading then runs once per output pixel (9x less interpolation/Phong work).

Layout (the perf-critical part, measured on v5e): face data is packed
8 faces x 16 floats into 128-lane rows, so both the host-side binning gather
and the kernel's per-program block DMA move contiguous 512-byte lane-aligned
rows.  One-face-per-row (n_bin, 16) layouts force Mosaic into a 64-byte
strided transfer per face — DMA descriptor issue dominates the whole kernel.

Per-face work is minimised by hoisting ALL scalar geometry to the XLA prep:
each slot carries sign-premultiplied EDGE COEFFICIENTS e_i(u,v) = eu*u +
ev*v + ec (inside test = all three e_i >= 0, no per-face area/sign/culling
arithmetic in-kernel) plus an affine Z-PLANE (zu, zv, zc) — the affine
interpolation of vertex z IS affine in screen (u, v), so one fma yields the
depth the old kernel needed nine edge-weighted sums for.  The subsample walk
is incremental (one vector add per edge per subsample) and the inside test is
min3 >= 0.  Invalid/culled faces are encoded as all-zero coefficients with
e0c = -1: never inside, zero cost.

Binning: the host computes per-tile COMPACTED INDEX LISTS over packed rows
(row bbox = union of its 8 faces' bboxes) via cumsum + scatter — NOT via
`jnp.where(size=...)`, whose sort-based lowering cost 33 ms at batch 64
(2/3 of the whole rasterise step), and NOT as a raw mask walked with a
per-row `pl.when` guard, whose ~200-cycle branch overhead per skipped row
cost just as much back inside the kernel.  The lists ride in SMEM where
dynamic scalar reads are free; the kernel walks its valid prefix with an
early-exit while_loop (-1 padded).  Face rows are read at *dynamic sublane*
indices (allowed; dynamic lane indexing is not) and the row's 8 faces
process at static lane offsets.  The table block's index map is constant
across a tile sweep, so Mosaic ships it to VMEM once per image and elides
the repeated DMAs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# floats per face: [e0u e0v e0c e1u e1v e1c e2u e2v e2c zu zv zc fid zmin zmax 0]
# zmin/zmax clamp the z-plane at the pixel centre: for sliver faces the
# affine extrapolation outside the face is unbounded (area -> 0 makes the
# plane arbitrarily steep) and an unclamped sliver would win the z-test at
# pixels it barely touches; clamping to the face's own vertex-z range
# restores the bounded convex-combination z the SSAA kernel resolves with.
_SLOT = 16
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

    n_sub = samples * samples
    step = 1.0 / samples
    # subsample (0,0) centre and pixel centre, hoisted across the row walk
    U0 = base_u + 0.5 * step
    V0 = base_v + 0.5 * step
    Uc = base_u + 0.5
    Vc = base_v + 0.5

    fid_ref[0, 0] = jnp.full(shape, -1, jnp.int32)
    zbuf_ref[0, 0] = jnp.full(shape, jnp.inf, jnp.float32)
    cov_ref[0, 0] = jnp.zeros(shape, jnp.int32)

    def cond(k):
        # the per-tile index list is -1 padded past its valid prefix
        return jnp.logical_and(k < n_rowbin, idx_ref[0, 0, 0, k] >= 0)

    def body(k):
        _process_row(idx_ref[0, 0, 0, k])
        return k + 1

    def _process_row(r):
        cov_bits = cov_ref[0, 0]
        zb = zbuf_ref[0, 0]
        fid = fid_ref[0, 0]
        for s in range(_PACK):  # static lane offsets within the 128-lane row
            o = s * _SLOT
            e0u, e0v, e0c = tab_ref[0, r, o + 0], tab_ref[0, r, o + 1], tab_ref[0, r, o + 2]
            e1u, e1v, e1c = tab_ref[0, r, o + 3], tab_ref[0, r, o + 4], tab_ref[0, r, o + 5]
            e2u, e2v, e2c = tab_ref[0, r, o + 6], tab_ref[0, r, o + 7], tab_ref[0, r, o + 8]
            zu, zv, zc = tab_ref[0, r, o + 9], tab_ref[0, r, o + 10], tab_ref[0, r, o + 11]
            f = tab_ref[0, r, o + 12].astype(jnp.int32)
            zmin, zmax = tab_ref[0, r, o + 13], tab_ref[0, r, o + 14]

            # row-start edge values at subsample (0,0); one fma-chain each
            e0r = e0u * U0 + (e0v * V0 + e0c)
            e1r = e1u * U0 + (e1v * V0 + e1c)
            e2r = e2u * U0 + (e2v * V0 + e2c)
            z_c = zu * Uc + (zv * Vc + zc)  # depth plane at the pixel centre
            z_c = jnp.minimum(jnp.maximum(z_c, zmin), zmax)

            du0, du1, du2 = e0u * step, e1u * step, e2u * step  # scalar increments
            dv0, dv1, dv2 = e0v * step, e1v * step, e2v * step

            bits_f = jnp.zeros(shape, jnp.int32)
            for sy in range(samples):
                if sy:
                    e0r = e0r + dv0
                    e1r = e1r + dv1
                    e2r = e2r + dv2
                c0, c1, c2 = e0r, e1r, e2r
                for sx in range(samples):
                    if sx:
                        c0 = c0 + du0
                        c1 = c1 + du1
                        c2 = c2 + du2
                    m = jnp.minimum(jnp.minimum(c0, c1), c2)
                    bit_val = 1 << (sy * samples + sx)
                    bits_f = jnp.where(m >= 0, bits_f | bit_val, bits_f)
            better = (bits_f > 0) & (z_c < zb)
            zb = jnp.where(better, z_c, zb)
            fid = jnp.where(better, jnp.broadcast_to(f, shape), fid)
            cov_bits = cov_bits | bits_f
        zbuf_ref[0, 0] = zb
        fid_ref[0, 0] = fid
        cov_ref[0, 0] = cov_bits

    jax.lax.while_loop(cond, body, jnp.int32(0))

    # popcount of the coverage bitmask -> covered-subsample count
    bits = cov_ref[0, 0]
    count = jnp.zeros_like(bits)
    for s in range(n_sub):
        count = count + ((bits >> s) & 1)
    cov_ref[0, 0] = count


def _msaa_prep(verts_screen, faces, image_size, tile, tile_h):
    """XLA-side prep: per-face edge/z coefficients packed into 128-lane rows
    plus per-tile compacted SMEM index lists.  Split out from the kernel
    launch so the prep-vs-kernel time split is measurable in isolation
    (tools/profile_raster.py)."""
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

    # precompute sign-premultiplied edge coefficients + affine z-plane: the
    # kernel's per-face scalar work collapses to 13 SMEM-free VMEM loads
    ax, ay, az = tri[:, :, 0], tri[:, :, 1], tri[:, :, 2]
    bx, by, bz = tri[:, :, 3], tri[:, :, 4], tri[:, :, 5]
    cx, cy, cz = tri[:, :, 6], tri[:, :, 7], tri[:, :, 8]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    valid = zok & (jnp.abs(area) > 1e-12)
    sg = jnp.where(area < 0, -1.0, 1.0)
    e0u, e0v, e0c = -(cy - by) * sg, (cx - bx) * sg, ((cy - by) * bx - (cx - bx) * by) * sg
    e1u, e1v, e1c = -(ay - cy) * sg, (ax - cx) * sg, ((ay - cy) * cx - (ax - cx) * cy) * sg
    e2u, e2v, e2c = -(by - ay) * sg, (bx - ax) * sg, ((by - ay) * ax - (bx - ax) * ay) * sg
    inv = 1.0 / jnp.where(valid, jnp.abs(area), 1.0)
    zu = (e0u * az + e1u * bz + e2u * cz) * inv
    zv = (e0v * az + e1v * bz + e2v * cz) * inv
    zc = (e0c * az + e1c * bz + e2c * cz) * inv
    fid_f = jnp.broadcast_to(jnp.arange(F, dtype=jnp.float32)[None], (B, F))
    zmin = jnp.minimum(jnp.minimum(az, bz), cz)
    zmax = jnp.maximum(jnp.maximum(az, bz), cz)
    coef = jnp.stack(
        [e0u, e0v, e0c, e1u, e1v, e1c, e2u, e2v, e2c, zu, zv, zc, fid_f,
         zmin, zmax], axis=-1
    )
    # invalid/padded faces: all-zero with e0c = -1 -> never inside, inert
    inert = jnp.zeros((15,), jnp.float32).at[2].set(-1.0)
    coef = jnp.where(valid[..., None], coef, inert)

    # pack 8 faces x 16 floats into one 128-lane row (contiguous DMA unit)
    n_rows = -(-F // _PACK)
    F8 = n_rows * _PACK
    slot = jnp.concatenate([coef, jnp.zeros((B, F, _SLOT - 15), jnp.float32)], axis=-1)
    slot = jnp.pad(slot, ((0, 0), (0, F8 - F), (0, 0)),
                   constant_values=0.0)
    # padded faces must be inert too: zero rows have e0c == 0 -> e0 == 0 >= 0!
    # overwrite their e0c with -1
    if F8 > F:
        pad_fix = jnp.zeros((B, F8 - F, _SLOT), jnp.float32).at[:, :, 2].set(-1.0)
        slot = slot.at[:, F:, :].set(pad_fix)
    packed = slot.reshape(B, n_rows, _PACK * _SLOT)
    n_rows_pad = -(-n_rows // 8) * 8
    if n_rows_pad > n_rows:
        pad_rows = jnp.zeros((B, n_rows_pad - n_rows, _PACK * _SLOT), jnp.float32)
        pad_rows = pad_rows.at[:, :, 2::_SLOT].set(-1.0)
        packed = jnp.concatenate([packed, pad_rows], axis=1)

    # host-side binning at ROW granularity: row bbox = union of its 8 faces
    # (invalid faces excluded via +/-inf substitution)
    inf = jnp.float32(jnp.inf)
    fu = tri[:, :, 0::3]
    fv = tri[:, :, 1::3]
    fumin = jnp.where(valid[..., None], fu, inf).min(-1)
    fumax = jnp.where(valid[..., None], fu, -inf).max(-1)
    fvmin = jnp.where(valid[..., None], fv, inf).min(-1)
    fvmax = jnp.where(valid[..., None], fv, -inf).max(-1)

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

    # per-tile compacted index lists — computed by a cumsum + COUNT-compare,
    # NOT `jnp.where(size=...)` (lowers to a per-tile sort, 33 ms at batch
    # 64) and NOT a scatter (XLA's serializing scatter lowering cost ~25 ms
    # of a 37 ms prep at batch 64).  With csum = inclusive prefix count of
    # overlapping rows, the j-th overlapping row id is exactly
    # count(csum <= j): rows before it have prefix <= j.  That is a fused
    # broadcast-compare + reduce over the row axis — pure VPU work.  Lists
    # stay ascending with a -1-padded tail (the kernel's early-exit
    # contract).  They ride in SMEM where dynamic scalar reads are free; the
    # packed table ships to VMEM once per image (block index constant across
    # the tile sweep, so Mosaic elides the repeated DMAs).
    flat_ov = overlap.reshape(B * nty * ntx, n_rows)
    csum = jnp.cumsum(flat_ov.astype(jnp.int32), axis=-1)  # (BT, n_rows)
    total = csum[:, -1:]
    slots = jnp.arange(n_rowbin, dtype=jnp.int32)[None, None]  # (1, 1, S)
    idx = jnp.sum(
        (csum[..., None] <= slots).astype(jnp.int32), axis=1, dtype=jnp.int32
    )  # (BT, S): count rows with prefix <= j == j-th overlapping row id
    idx = jnp.where(slots[0] < total, idx, -1)
    idx = idx.reshape(B, nty * ntx, 1, n_rowbin)
    return idx, packed, n_rows_pad, n_rowbin


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "tile", "tile_h", "samples", "interpret"),
)
def rasterize_msaa_pallas(
    verts_screen: jnp.ndarray,  # (B, V, 3) [u, v, z] at BASE resolution
    faces: jnp.ndarray,
    image_size: int,
    tile: int = 128,  # tile width (lane dim; multiples of 128)
    tile_h: int = 16,  # tile height (sublane dim); small tiles => tight bins
    samples: int = 3,
    interpret: bool = False,
):
    """Returns (face_id (B,S,S) int32, coverage (B,S,S) float in [0,1], zbuf).

    zbuf is the selected face's affine z-plane evaluated at the pixel centre
    (inf on background) — the MSAA render path recomputes its own
    perspective-correct depth during interpolation and ignores this output.
    """
    B = verts_screen.shape[0]
    S = image_size
    W_pad = -(-S // tile) * tile
    H_pad = -(-S // tile_h) * tile_h
    ntx = W_pad // tile
    nty = H_pad // tile_h
    idx, packed, n_rows_pad, n_rowbin = _msaa_prep(
        verts_screen, faces, image_size, tile, tile_h
    )

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
