"""Batched row gather / scatter-add as MXU one-hot matmuls (Pallas TPU).

`gather_rows(table (B, F, D), idx (B, P)) -> (B, P, D)` replaces XLA's
per-pixel dynamic row gather.  At the renderer's scale (B=64, P=224^2,
F~1.5k, D~36) the XLA gather costs ~60 ms forward and its transpose
scatter-add ~45 ms backward on v5e — descriptor-issue bound, the classic TPU
anti-pattern.  Expressed as a one-hot matmul both directions are dense MXU
work:

  forward:   out[p, :]   = onehot[f, p]^T contraction with table[f, :]
  backward:  dtable[f,:] = sum_p onehot[p, f] * g[p, :]    (the custom VJP)

Design notes (v5e-measured):
  * the one-hot block is built IN VMEM from the block's indices vs an iota —
    it never exists in HBM (an XLA einsum would stream B*P*F of it).
  * grid is (B, pixel-blocks) with 4096 pixels per program and the TABLE
    pre-blocked on a leading dim at 1024 rows: the (fblk, pblk) one-hot
    scratch (8 MB bf16) dominates the ~16 MB VMEM budget, and fewer/larger
    programs amortise per-program overhead.
  * PER-BLOCK ROW-RANGE SKIP: each pixel block's index min/max (computed on
    the XLA side, one cheap reduce) rides in SMEM; the kernel's table loop
    runs only over the touched 1024-row blocks.  With spatially coherent
    row ids (the renderer Morton-sorts faces, renderer.morton_face_order)
    a pixel band references a narrow id range — background-only blocks do
    ZERO table work, covered bands visit a fraction of the blocks.  Exact:
    skipped blocks match no index, so they contribute exact zeros (forward)
    and receive exact-zero gradient contributions (backward).
  * near-fp32 from a bf16 MXU: the one-hot operand is exactly representable
    in bf16, so only the value operand needs a hi/lo split
    (v = hi + lo, hi = bf16(v), lo = bf16(v - hi)): TWO bf16 passes with f32
    accumulation give ~2^-16 relative accuracy (vs 2^-8 for one pass, six
    passes for a generic HIGHEST fp32 dot).  For screen coords at 224 px
    that is ~3e-3 px — two orders below the rasteriser's subsample spacing.
  * the hi and lo halves are stacked on the streamed sublane dim and share
    ONE dot per block: (2*D_pad, F_blk) @ (F_blk, P_blk).  D (~36) rides the
    sublane dim where padding costs ~10%, instead of the lane dim where
    padding to 128 would waste 3.5x; D_pad keeps the halves vreg-aligned.
  * idx = -1 (background / padding) matches no row -> exact zeros, no fake
    gradient to row 0.
  * any table size works (the f loop covers NIMBLE's ~12k faces); the
    backward accumulates dtable across pixel blocks with the standard k-loop
    revisit pattern (output block index constant along the reduction dim).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PBLK = 4096  # pixels per program
_FBLK = 1024  # table rows per in-kernel step; onehot scratch (1024, 4096) bf16


def _fwd_kernel(idx_ref, rng_ref, hilo_ref, out_ref, *, fblk: int, nfb: int,
                pblk: int, d: int):
    idx = idx_ref[0, 0]  # (1, pblk) int32
    lo = rng_ref[0, 0, 0, 0]  # first touched table block
    hi = rng_ref[0, 0, 0, 1]  # last touched block (inclusive; hi < lo = none)
    base = jax.lax.broadcasted_iota(jnp.int32, (fblk, pblk), 0)

    def body(fj, acc):
        j = base + fj * fblk
        onehot = (j == idx).astype(jnp.bfloat16)  # -1 matches none
        hilo = hilo_ref[0, fj]  # (2d, fblk) — dynamic leading-dim index
        return acc + jnp.dot(hilo, onehot, preferred_element_type=jnp.float32)

    acc = jnp.zeros((2 * d, pblk), jnp.float32)
    acc = jax.lax.fori_loop(lo, hi + 1, body, acc)
    out_ref[0] = acc[:d] + acc[d:]  # hi + lo halves -> (d, pblk) f32


def _bwd_kernel(idx_ref, rng_ref, ghilo_ref, dtab_ref, *, fblk: int, nfb: int,
                pblk: int, d: int):
    pj = pl.program_id(1)
    idx = idx_ref[0, 0]  # (1, pblk)
    lo = rng_ref[0, 0, 0, 0]
    hi = rng_ref[0, 0, 0, 1]
    g = ghilo_ref[0]  # (2d, pblk)
    base = jax.lax.broadcasted_iota(jnp.int32, (fblk, pblk), 0)

    @pl.when(pj == 0)
    def _init():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    def body(fj, _):
        j = base + fj * fblk
        onehot = (j == idx).astype(jnp.bfloat16)  # (fblk, pblk)
        # contract pblk of g with pblk (dim 1) of onehot: g @ onehot^T
        a = jax.lax.dot_general(
            g, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2d, fblk)
        dtab_ref[0, fj] = dtab_ref[0, fj] + a[:d] + a[d:]
        return 0

    jax.lax.fori_loop(lo, hi + 1, body, 0)


def _split_stack(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=1)


def _pad_axis(x, m, axis, value):
    pad = -x.shape[axis] % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False):
    """table (B, F, D) f32, idx (B, P) int32 (-1 -> zeros) -> (B, P, D) f32."""
    out, _ = _gather_fwd(table, idx, interpret)
    return out


def _dims(F, P, D):
    d_pad = -(-D // 8) * 8
    fblk = min(_FBLK, -(-F // 128) * 128)
    f_pad = -(-F // fblk) * fblk
    pblk = min(_PBLK, -(-P // 128) * 128)
    p_pad = -(-P // pblk) * pblk
    return d_pad, fblk, f_pad, pblk, p_pad


def _block_ranges(idxp, fblk, nfb):
    """Per pixel-block first/last touched table block, (B, nblk, 1, 2) i32.

    Background (-1) and padding indices are excluded; an all-background
    block gets (1, 0) -> empty fori_loop."""
    idx = idxp[:, :, 0]  # (B, nblk, pblk)
    valid = idx >= 0
    big = jnp.int32(nfb * fblk)
    lo = jnp.min(jnp.where(valid, idx, big), axis=-1) // fblk
    hi = jnp.max(jnp.where(valid, idx, -1), axis=-1) // fblk
    lo = jnp.where(hi < 0, 1, jnp.minimum(lo, nfb - 1))
    hi = jnp.where(hi < 0, 0, hi)
    return jnp.stack([lo, hi], axis=-1)[:, :, None, :].astype(jnp.int32)


def _blocked_table(hilo, fblk, nfb):
    """(B, 2d, f_pad) -> (B, nfb, 2d, fblk): dynamic block reads index a
    LEADING dim in-kernel (dynamic lane offsets are not supported)."""
    B, d2, f_pad = hilo.shape
    return hilo.reshape(B, d2, nfb, fblk).transpose(0, 2, 1, 3)


def _gather_impl(table, idx, interpret):
    B, F, D = table.shape
    P = idx.shape[1]
    d_pad, fblk, f_pad, pblk, p_pad = _dims(F, P, D)
    nfb = f_pad // fblk
    tab_t = _pad_axis(jnp.swapaxes(table, 1, 2), fblk, 2, 0.0)  # (B, D, F_pad)
    tab_t = _pad_axis(tab_t, 8, 1, 0.0)  # (B, D_pad, F_pad)
    hilo = _blocked_table(_split_stack(tab_t), fblk, nfb)  # (B, nfb, 2d, fblk)
    idxp = _pad_axis(idx.astype(jnp.int32), pblk, 1, -1)
    idxp = idxp.reshape(B, p_pad // pblk, 1, pblk)
    ranges = _block_ranges(idxp, fblk, nfb)

    grid = (B, p_pad // pblk)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, fblk=fblk, nfb=nfb, pblk=pblk, d=d_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, pblk), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nfb, 2 * d_pad, fblk), lambda b, p: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_pad, pblk), lambda b, p: (b, 0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d_pad, p_pad), jnp.float32),
        interpret=interpret,
    )(idxp, ranges, hilo)
    return jnp.swapaxes(out, 1, 2)[:, :P, :D]  # (B, P, D)


def _gather_fwd(table, idx, interpret):
    return _gather_impl(table, idx, interpret), (idx, table.shape)


def _gather_bwd(interpret, res, g):
    idx, (B, F, D) = res
    P = idx.shape[1]
    d_pad, fblk, f_pad, pblk, p_pad = _dims(F, P, D)
    nfb = f_pad // fblk
    g_t = _pad_axis(jnp.swapaxes(g, 1, 2), pblk, 2, 0.0)  # (B, D, P_pad)
    g_t = _pad_axis(g_t, 8, 1, 0.0)  # (B, D_pad, P_pad)
    ghilo = _split_stack(g_t)  # (B, 2*D_pad, P_pad)
    idxp = _pad_axis(idx.astype(jnp.int32), pblk, 1, -1)
    idxp = idxp.reshape(B, p_pad // pblk, 1, pblk)
    ranges = _block_ranges(idxp, fblk, nfb)

    grid = (B, p_pad // pblk)
    dtab_blk = pl.pallas_call(
        functools.partial(_bwd_kernel, fblk=fblk, nfb=nfb, pblk=pblk, d=d_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, pblk), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2 * d_pad, pblk), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nfb, d_pad, fblk), lambda b, p: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nfb, d_pad, fblk), jnp.float32),
        interpret=interpret,
    )(idxp, ranges, ghilo)
    # (B, nfb, d_pad, fblk) -> (B, d_pad, f_pad) -> (B, F, D)
    dtab_t = dtab_blk.transpose(0, 2, 1, 3).reshape(B, d_pad, f_pad)
    dtable = jnp.swapaxes(dtab_t, 1, 2)[:, :F, :D]
    return dtable, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
