"""Pallas TPU kernel: fused u8 RF front-end on the MXU.

The XLA formulation of the u8 front-end (ops.fir.fir_block_decim_mm_bf16x
fed by a u8->bf16 normalize) still materializes two HBM intermediates per
block: the deinterleaved/normalized bf16 signal and the im2col window
matrix (~1.1x the signal again).  This kernel removes both: the raw
bias-flipped int8 samples stream HBM->VMEM once, and normalization,
window assembly, and the banded weight-split matmul all happen in VMEM:

    y[b, w*U + u] = sum_t  (xc_i8[b, w*S + t] / 128) * W[t, u],

    S = U * decim   (window stride),   W[t, u] = h[K-1 + u*decim - t]

per grid step (b-tile, w): two VIEWS of the same int8 operand — the
main block at w and a halo block covering the next ``hb`` lanes (window
width S + hb >= T_win = (U-1)*decim + K; ``hb`` is the smallest
128-multiple dividing S that covers K - decim, so both views tile the
operand exactly) — are converted i8 -> bf16 * 2^-7 (EXACT: the i8 value
is the u8 sample minus 128, see ops.fir.fir_block_decim_mm_bf16x) into a
VMEM scratch window, then one MXU pass against the banded weights stacked
as [W_hi | W_lo] (weight-split: ~2^-17 relative weight error) produces
U = 128 output columns.

Ref: the reference's rank-1 hot loop, convolveBlockFastFIR at the 2.4 MS/s
RF rate (src/filter.cpp:158-188; report Table 3), here for a channel batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.ops.fir import _band_matrix


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


#: VMEM budget for per-step blocks + double buffering (chip ~16 MB/core)
_VMEM_BUDGET_BYTES = 8 << 20
_U = 128   # output columns per window = one MXU tile


def _halo_lanes(decim: int, n_taps: int) -> int:
    """Smallest 128-multiple that divides the window stride S = 128*decim
    AND covers the inter-window overlap K - decim."""
    need = n_taps - decim
    for d in range(1, decim + 1):
        if decim % d == 0 and 128 * d >= need:
            return 128 * d
    raise ValueError(f"taps {n_taps} too long for stride {128 * decim}")


def _kernel(xm_ref, xh_ref, w_ref, out_ref, win, *, stride: int, hb: int):
    scale = jnp.bfloat16(1.0 / 128.0)
    win[:, :stride] = xm_ref[...].astype(jnp.bfloat16) * scale
    win[:, stride:] = xh_ref[...].astype(jnp.bfloat16) * scale
    acc = jnp.dot(win[...], w_ref[...],
                  preferred_element_type=jnp.float32)
    out_ref[...] = acc[:, :_U] + acc[:, _U:]


def _auto_btile(b_pad: int, ww: int) -> int:
    """Batch-tile so the i8 blocks + bf16 window + split weights + out fit
    the VMEM budget with double buffering."""
    per_row = ww * 1 * 2 + ww * 2 + _U * 4 * 2 + 2 * _U * 2  # i8 x2buf,
    # bf16 win, f32 out x2buf, acc
    fixed = ww * 2 * _U * 2 * 2                              # [W_hi|W_lo]
    bt = (_VMEM_BUDGET_BYTES - fixed) // per_row // 32 * 32
    return max(32, min(bt, b_pad))


def fir_decim_mxu_pallas(xc_i8: jnp.ndarray, h: jnp.ndarray, decim: int,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Decimating FIR over bias-flipped int8 input (values = u8 - 128).

    ``xc_i8`` is ``[state, x]`` of shape (..., N + K - 1), int8; returns
    float32 (..., N // decim) equal to the banded-matmul FIR of the
    u8-normalized signal.  Shapes/decim static; ``h`` may be traced.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert xc_i8.dtype == jnp.int8, xc_i8.dtype
    k = h.shape[0]
    n_ext = xc_i8.shape[-1]
    n = n_ext - (k - 1)
    assert n % decim == 0, (n, decim)
    n_out = n // decim
    stride = _U * decim
    hb = _halo_lanes(decim, k)
    ww = stride + hb                      # assembled window width
    n_win = _cdiv(n_out, _U)

    lead = xc_i8.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    b_pad = _cdiv(b, 32) * 32
    bt = _auto_btile(b_pad, ww)
    n_btiles = _cdiv(b_pad, bt)
    b_full = n_btiles * bt

    xf = xc_i8.reshape(b, n_ext)
    # pad lanes so main view covers n_win strides plus one full halo block
    lane_pad = n_win * stride + hb - n_ext
    xf = jnp.pad(xf, ((0, b_full - b), (0, max(lane_pad, 0))))

    # banded weights, zero-extended to the window width, split hi/lo and
    # stacked on the output axis: one MXU pass, summed halves in-kernel
    w32, t_win = _band_matrix(h, decim, _U, jnp.float32)
    assert t_win <= ww, (t_win, ww)
    w32 = jnp.pad(w32, ((0, ww - t_win), (0, 0)))
    w_hi = w32.astype(jnp.bfloat16)
    w_lo = (w32 - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    w2 = jnp.concatenate([w_hi, w_lo], axis=-1)        # (ww, 2U)

    kern = functools.partial(_kernel, stride=stride, hb=hb)
    out = pl.pallas_call(
        kern,
        grid=(n_btiles, n_win),
        in_specs=[
            pl.BlockSpec((bt, stride), lambda bi, w: (bi, w),
                         memory_space=pltpu.VMEM),
            # halo: the next hb lanes after window w's stride — a second
            # view of the SAME operand (hb | stride, so it tiles exactly)
            pl.BlockSpec((bt, hb),
                         lambda bi, w, s=stride // hb: (bi, (w + 1) * s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ww, 2 * _U), lambda bi, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, _U), lambda bi, w: (bi, w),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_full, n_win * _U), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, ww), jnp.bfloat16)],
        interpret=interpret,
    )(xf, xf, w2)
    return out[:b, :n_out].reshape(lead + (n_out,))


def fir_frontend_u8_pallas(iq_u8: jnp.ndarray, h: jnp.ndarray,
                           st2: jnp.ndarray, decim: int,
                           interpret: bool | None = None
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for the receiver's u8 MXU front-end: interleaved raw u8 in,
    decimated f32 I/Q out.

    ``iq_u8`` is (..., 2N) interleaved uint8; ``st2`` is the (..., 2, K-1)
    f32 overlap-save state whose values are u8-normalized (bf16-exact), so
    ``round(st2 * 128)`` recovers the bias-flipped bytes losslessly.  The
    u8 -> i8 bias flip ``x ^ 0x80`` equals x - 128 in two's complement —
    the only XLA-side pass is the deinterleave/concat relayout of raw
    bytes (a quarter of the f32 path's traffic).
    """
    k = h.shape[0]
    n = iq_u8.shape[-1] // 2
    i8 = lax.bitcast_convert_type(iq_u8 ^ jnp.uint8(128), jnp.int8)
    x2 = jnp.stack([i8[..., 0::2], i8[..., 1::2]], axis=-2)
    st_i8 = jnp.round(st2 * 128.0).astype(jnp.int8)
    xc = jnp.concatenate([st_i8, x2], axis=-1)
    y = fir_decim_mxu_pallas(xc, h, decim, interpret=interpret)
    tail = xc[..., xc.shape[-1] - (k - 1):]
    new_st = tail.astype(jnp.float32) * jnp.float32(1.0 / 128.0)
    return y, new_st
