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


def _halo_lanes_u(decim: int, n_taps: int, u_blk: int) -> int:
    """Smallest 128-multiple that divides the window stride S = u_blk*decim
    AND covers the inter-window overlap K - decim."""
    stride = u_blk * decim
    need = n_taps - decim
    for m in range(128, stride + 1, 128):
        if stride % m == 0 and m >= need:
            return m
    raise ValueError(f"taps {n_taps} too long for stride {stride}")


def _halo_lanes(decim: int, n_taps: int) -> int:
    return _halo_lanes_u(decim, n_taps, _U)


def _kernel(xm_ref, xh_ref, w_ref, out_ref, win, *, stride: int, hb: int):
    scale = jnp.bfloat16(1.0 / 128.0)
    win[:, :stride] = xm_ref[...].astype(jnp.bfloat16) * scale
    win[:, stride:] = xh_ref[...].astype(jnp.bfloat16) * scale
    acc = jnp.dot(win[...], w_ref[...],
                  preferred_element_type=jnp.float32)
    out_ref[...] = acc[:, :_U] + acc[:, _U:]


def _auto_btile(b_pad: int, ww: int, n_ocols: int = 2 * _U) -> int:
    """Batch-tile so the i8 blocks + bf16 window + split weights + out fit
    the VMEM budget with double buffering.  Prefers a tile that divides
    ``b_pad`` evenly — a 62%-full final tile is pure wasted MXU work."""
    per_row = ww * 1 * 2 + ww * 2 + n_ocols * 4 * 2 + n_ocols * 4
    fixed = ww * n_ocols * 2 * 2                             # [W_hi|W_lo]
    bt = (_VMEM_BUDGET_BYTES - fixed) // per_row // 32 * 32
    bt = max(32, min(bt, b_pad))
    for cand in range(bt, 31, -32):
        if b_pad % cand == 0:
            return cand
    return bt


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


# --- interleaved-signal variant: zero relayout passes ---------------------
#
# The micro-attribution at C=512 (docs/profile_stages.json, round 3) put
# the u8 deinterleave at ~1.0 ms and the im2col window gather at ~0.8 ms
# while the matmul itself costs ~0.2 ms — the front-end is relayout-bound,
# not compute-bound.  This variant removes BOTH relayouts: the kernel
# reads the RAW interleaved bytes (bitcast u8->i8 is free) and the banded
# weights are interleaved to match,
#
#     W_int[2t + a, a*U + u] = W[t, u]        (a = 0 I-arm, 1 Q-arm)
#
# so one (bt, 2S)x(2S+2hb, 4U) MXU pass per window yields I and Q output
# columns side by side.  The doubled contraction length doubles MXU FLOPs
# — a ~0.2 ms cost buying ~1.8 ms of relayout.  The only XLA-side pass is
# the state-prepend concat of raw bytes.


def _kernel_int(xm_ref, xh_ref, whi_ref, wlo_ref, out_ref, win, *,
                s2: int):
    # bias flip on raw bits: (x ^ 0x80) as int8 == x - 128 for the u8
    # sample x (two's-complement sign-bit flip); the bf16 convert of an
    # 8-bit integer and the *2^-7 scale are exact.  NOTE a select-based
    # formulation (jnp.where on bf16) crashes this Mosaic toolchain's
    # compile helper — the XOR is both the fast and the compilable form.
    def norm(ref):
        return ((ref[...] ^ jnp.int8(-128)).astype(jnp.bfloat16)
                * jnp.bfloat16(1.0 / 128.0))

    win[:, :s2] = norm(xm_ref)
    win[:, s2:] = norm(xh_ref)
    w = win[...]
    out_ref[...] = (jnp.dot(w, whi_ref[...],
                            preferred_element_type=jnp.float32)
                    + jnp.dot(w, wlo_ref[...],
                              preferred_element_type=jnp.float32))


def fir_frontend_u8_pallas_int(iq_u8: jnp.ndarray, h: jnp.ndarray,
                               st2: jnp.ndarray, decim: int,
                               u_blk: int | None = None,
                               interpret: bool | None = None
                               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Interleaved-weights drop-in for :func:`fir_frontend_u8_pallas`.

    Same contract: (..., 2N) interleaved uint8 in, ((..., 2, N/decim) f32,
    (..., 2, K-1) f32 state) out, outputs equal to the banded-matmul FIR
    of the u8-normalized signal (weight-split bf16 passes).  ``u_blk``
    trades window count against weight-block size (64 keeps the
    interleaved W under ~1 MB of VMEM per split half).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = h.shape[0]
    n = iq_u8.shape[-1] // 2
    assert n % decim == 0, (n, decim)
    n_out = n // decim
    if u_blk is None:
        # smallest block with a valid halo width (the halo must be a
        # 128-multiple dividing the stride — not every (decim, u) has one)
        for u_blk in (64, 128, 256):
            try:
                _halo_lanes_u(decim, k, u_blk)
                break
            except ValueError:
                continue
    stride = u_blk * decim
    hb = _halo_lanes_u(decim, k, u_blk)
    s2, hb2 = 2 * stride, 2 * hb
    ww2 = s2 + hb2
    u2 = 2 * u_blk
    n_win = _cdiv(n_out, u_blk)

    lead = iq_u8.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    b_pad = _cdiv(b, 32) * 32
    bt = _auto_btile(b_pad, ww2, n_ocols=u2)
    n_btiles = _cdiv(b_pad, bt)
    b_full = n_btiles * bt

    # raw bytes end to end: bitcast input (free), state back to bytes
    # (lossless — values are u8-normalized), ONE concat/pad copy pass
    x_i8 = lax.bitcast_convert_type(iq_u8, jnp.int8).reshape(b, 2 * n)
    st_int = jnp.moveaxis(st2, -2, -1).reshape(b, 2 * (k - 1))
    st_i8 = lax.bitcast_convert_type(
        (st_int * 128.0 + 128.0).astype(jnp.uint8), jnp.int8)
    xc0 = jnp.concatenate([st_i8, x_i8], axis=-1)
    lane_pad = n_win * s2 + hb2 - xc0.shape[-1]
    xc = jnp.pad(xc0, ((0, b_full - b), (0, max(lane_pad, 0))))

    # interleaved banded weights, zero-extended, split hi/lo as two
    # separate operands (columns [I | Q] each)
    w32, t_win = _band_matrix(h, decim, u_blk, jnp.float32)
    wi = jnp.zeros((ww2, 2, u_blk), jnp.float32)
    rows = np.arange(t_win)
    wi = wi.at[jnp.asarray(2 * rows), 0, :].set(w32)
    wi = wi.at[jnp.asarray(2 * rows + 1), 1, :].set(w32)
    wi = wi.reshape(ww2, u2)
    w_hi = wi.astype(jnp.bfloat16)
    w_lo = (wi - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    kern = functools.partial(_kernel_int, s2=s2)
    wspec = pl.BlockSpec((ww2, u2), lambda bi, w: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_btiles, n_win),
        in_specs=[
            pl.BlockSpec((bt, s2), lambda bi, w: (bi, w),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hb2),
                         lambda bi, w, s=s2 // hb2: (bi, (w + 1) * s),
                         memory_space=pltpu.VMEM),
            wspec, wspec,
        ],
        out_specs=pl.BlockSpec((bt, u2), lambda bi, w: (bi, w),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_full, n_win * u2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, ww2), jnp.bfloat16)],
        interpret=interpret,
    )(xc, xc, w_hi, w_lo)

    y = out[:b].reshape(b, n_win, 2, u_blk)
    y = jnp.moveaxis(y, 2, 1).reshape(b, 2, n_win * u_blk)[..., :n_out]
    # tail from the state-prepended concat (NOT x_i8 alone): a block with
    # N < K-1 samples must carry part of the incoming state forward, same
    # contract as fir_frontend_u8_pallas / every other FIR op (ADVICE r3)
    tail_u8 = lax.bitcast_convert_type(
        xc0[:, xc0.shape[-1] - 2 * (k - 1):], jnp.uint8)
    tail = (tail_u8.astype(jnp.float32) - 128.0) * jnp.float32(1.0 / 128.0)
    new_st = jnp.moveaxis(tail.reshape(b, k - 1, 2), -1, -2)
    return (y.reshape(lead + (2, n_out)),
            new_st.reshape(lead + (2, k - 1)))
