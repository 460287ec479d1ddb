"""Batched row gather / scatter-add as MXU one-hot matmuls (Pallas TPU).

`gather_rows(table (B, F, D), idx (B, P)) -> (B, P, D)` replaces XLA's
per-pixel dynamic row gather.  At the renderer's scale (B=64, P=224^2,
F~1.5k, D~36) the XLA gather costs ~60 ms forward and its transpose
scatter-add ~45 ms backward on v5e — descriptor-issue bound, the classic TPU
anti-pattern.  Expressed as a one-hot matmul both directions are dense MXU
work measured in single-digit milliseconds:

  forward:   out[p, :]   = onehot[f, p]^T contraction with table[f, :]
  backward:  dtable[f,:] = sum_p onehot[p, f] * g[p, :]    (the custom VJP)

Design notes (v5e-measured):
  * the one-hot block is built IN VMEM from the tile's indices vs an iota —
    it never exists in HBM (an XLA einsum would stream B*P*F of it).
  * near-fp32 from a bf16 MXU: the one-hot operand is exactly representable
    in bf16, so only the value operand needs a hi/lo split
    (v = hi + lo, hi = bf16(v), lo = bf16(v - hi)): TWO bf16 passes with f32
    accumulation give ~2^-16 relative accuracy (vs 2^-8 for one pass, six
    passes for a generic HIGHEST fp32 dot).  For screen coords at 224 px
    that is ~3e-3 px — two orders below the rasteriser's subsample spacing.
  * dots run in the (D, F) @ (F, P_blk) layout: D (~36) rides the streamed
    sublane dim where padding to 8 costs ~10%, instead of the lane dim where
    padding to 128 would waste 3.5x.
  * idx = -1 (background / padding) matches no row -> exact zeros, no fake
    gradient to row 0.
  * the backward kernel accumulates dtable across pixel blocks with the
    standard k-loop revisit pattern (output block index constant along the
    reduction grid dim).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PBLK = 2048  # pixels per program; onehot block (F_pad, 2048) bf16 fits VMEM


def _fwd_kernel(idx_ref, hilo_ref, out_ref, *, f_pad: int, pblk: int, d: int):
    idx = idx_ref[0, 0]  # (1, PBLK) int32
    j = jax.lax.broadcasted_iota(jnp.int32, (f_pad, pblk), 0)
    onehot = (j == idx).astype(jnp.bfloat16)  # (F_pad, PBLK); -1 matches none
    # hi stacked over lo: ONE (2D, F_pad) dot doubles the streamed-sublane MXU
    # utilisation vs two (D, F_pad) dots (D ~ 36 of 128)
    acc = jnp.dot(hilo_ref[0], onehot, preferred_element_type=jnp.float32)
    out_ref[0] = acc[:d] + acc[d:]  # (D, PBLK) f32


def _bwd_kernel(idxc_ref, ghilo_ref, dtab_ref, *, f_pad: int, pblk: int, d: int):
    pj = pl.program_id(1)
    idxc = idxc_ref[0, 0]  # (PBLK, 1) int32 column
    j = jax.lax.broadcasted_iota(jnp.int32, (pblk, f_pad), 1)
    onehot = (j == idxc).astype(jnp.bfloat16)  # (PBLK, F_pad), built transposed
    acc = jnp.dot(ghilo_ref[0], onehot, preferred_element_type=jnp.float32)
    acc = acc[:d] + acc[d:]

    @pl.when(pj == 0)
    def _init():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    dtab_ref[0] = dtab_ref[0] + acc  # (D, F_pad) accumulated over pixel blocks


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


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


def _gather_impl(table, idx, interpret):
    B, F, D = table.shape
    P = idx.shape[1]
    f_pad = -(-F // 128) * 128
    p_pad = -(-P // _PBLK) * _PBLK
    # D padded to a sublane multiple so the in-kernel hi/lo halves split on
    # vreg boundaries (an unaligned sublane slice forces a full relayout)
    d_pad = -(-D // 8) * 8
    tab_t = _pad_axis(jnp.swapaxes(table, 1, 2), 128, 2, 0.0)  # (B, D, F_pad)
    tab_t = _pad_axis(tab_t, 8, 1, 0.0)  # (B, D_pad, F_pad)
    hi, lo = _split(tab_t)
    hilo = jnp.concatenate([hi, lo], axis=1)  # (B, 2*D_pad, F_pad)
    idxp = _pad_axis(idx.astype(jnp.int32), _PBLK, 1, -1)
    idxp = idxp.reshape(B, p_pad // _PBLK, 1, _PBLK)

    grid = (B, p_pad // _PBLK)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, f_pad=f_pad, pblk=_PBLK, d=d_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, _PBLK), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d_pad, f_pad), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_pad, _PBLK), lambda b, p: (b, 0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d_pad, p_pad), jnp.float32),
        interpret=interpret,
    )(idxp, hilo)
    return jnp.swapaxes(out, 1, 2)[:, :P, :D]  # (B, P, D)


def _gather_fwd(table, idx, interpret):
    return _gather_impl(table, idx, interpret), (idx, table.shape)


def _gather_bwd(interpret, res, g):
    idx, (B, F, D) = res
    P = idx.shape[1]
    f_pad = -(-F // 128) * 128
    p_pad = -(-P // _PBLK) * _PBLK
    d_pad = -(-D // 8) * 8
    g_t = _pad_axis(jnp.swapaxes(g, 1, 2), _PBLK, 2, 0.0)  # (B, D, P_pad)
    g_t = _pad_axis(g_t, 8, 1, 0.0)  # (B, D_pad, P_pad)
    ghi, glo = _split(g_t)
    ghilo = jnp.concatenate([ghi, glo], axis=1)  # (B, 2*D_pad, P_pad)
    idxc = _pad_axis(idx.astype(jnp.int32), _PBLK, 1, -1)
    idxc = idxc.reshape(B, p_pad // _PBLK, _PBLK, 1)

    grid = (B, p_pad // _PBLK)
    dtab_t = pl.pallas_call(
        functools.partial(_bwd_kernel, f_pad=f_pad, pblk=_PBLK, d=d_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, _PBLK, 1), lambda b, p: (b, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d_pad, _PBLK), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_pad, f_pad), lambda b, p: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d_pad, f_pad), jnp.float32),
        interpret=interpret,
    )(idxc, ghilo)
    dtable = jnp.swapaxes(dtab_t, 1, 2)[:, :F, :D]  # (B, F, D)
    return dtable, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
