"""Pallas TPU kernel: fused batched decimating FIR (the hottest kernel).

The reference's rank-1 hot loop is the RF front-end's I/Q decimating FIR at
2.4 MS/s (convolveBlockFastFIR, src/filter.cpp:158-188; ~128 ms of a
~290 ms mono block budget, report Table 3).  This kernel computes

    y[b, j] = sum_u h_rev[u] * xc[b, j*D + u],   h_rev[u] = h[K-1-u]

for a batch of channels in one pass, with a layout chosen for the TPU's
(sublane, lane) tiling:

* the padded input is reshaped to polyphase rows and TRANSPOSED to
  ``(B, D, n_out + R)`` so the long (time) axis lies along lanes;
* the grid walks (batch tile, lane tile) pairs with two PIPELINE-MANAGED
  input blocks — the main ``(D, Bt, tile)`` window plus a small shifted
  halo block covering the next ``R-1`` rows (polyphase windows overlap by
  R rows; standard BlockSpecs cannot overlap, so the halo is a second,
  gather-shifted view of the same array).  Everything Mosaic touches is a
  bounded VMEM block: whole-array (ANY/HBM) operands are staged into
  scoped VMEM by XLA's layout pass on this toolchain, which OOMs compile
  at large channel batches — the original manual-DMA design hit exactly
  that at 128 lanes;
* coefficients live in SMEM (R*D scalars), streamed by the scalar core;
* the batch rides a SECOND grid dimension, so arbitrarily large channel
  batches stream through fixed-size VMEM blocks (no fallback to the XLA
  conv in the serving regime); the (batch tile, lane tile) pair is chosen
  to fill — but never exceed — the VMEM budget.

Cost per tile: R*D fused multiply-adds over ``tile`` lanes — the polyphase
minimum (identical MAC count to the reference's loop), at full VPU lane
utilization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: lanes of the halo block (must be 128-aligned and >= r_rows of any mode)
_HALO = 128
#: VMEM budget for all per-tile blocks + scratch (chip has ~16 MB/core;
#: leave headroom for Mosaic's own buffers and pipeline double buffering)
_VMEM_BUDGET_BYTES = 10 << 20


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _phase_coeffs(h: jnp.ndarray, decim: int) -> jnp.ndarray:
    """hr[r, p] = h_rev[r*decim + p] zero-padded to full rows.
    Works on traced ``h`` (coefficients may be jit arguments)."""
    k = h.shape[0]
    r_rows = _cdiv(k, decim)
    hr = jnp.zeros((r_rows * decim,), jnp.float32)
    hr = hr.at[:k].set(h[::-1].astype(jnp.float32))
    return hr.reshape(r_rows, decim)


def _auto_tiles(b_pad: int, d_pad: int, r_rows: int = 16
                ) -> tuple[int, int]:
    """Pick (batch tile, lane tile) so all per-step VMEM fits the budget.

    Two consumers share it: the pipeline blocks (2x main tile for double
    buffering + window scratch + halo/out, ~``3*tile + 3*_HALO`` lanes of
    ``bt*d_pad`` sublane rows) AND the kernel's compile-time value stack —
    the ``phase`` body unrolls ``r_rows`` static-shift FMA temps of
    (bt, tile) floats each, which Mosaic keeps live in VMEM.  Small-decim
    modes have LARGE r_rows (ceil(taps/decim): 51 at mode 3's rf_decim=3
    vs 16 at decim=10), which is exactly what blew the r1-r4 formula's
    compile at mode 3 (VERDICT r4 #6): it only counted the blocks.  Small
    batches take the whole batch with the largest lane tile; large
    batches tile the batch at a fixed 1024-lane tile (halo DMA overhead
    _HALO/tile = 12.5%)."""
    def per_row(tile: int) -> int:      # bytes per batch sublane row
        return 4 * (d_pad * (3 * tile + 3 * _HALO) + (r_rows + 1) * tile)

    for tile in (2048, 1536, 1024):
        if b_pad * per_row(tile) <= _VMEM_BUDGET_BYTES:
            return b_pad, tile
    tile = 1024
    bt = _VMEM_BUDGET_BYTES // per_row(tile)
    bt = max(8, bt // 8 * 8)
    return min(bt, b_pad), tile


def _kernel(hr_ref, xm_ref, xh_ref, out_ref, win, *, tile: int,
            r_rows: int, decim: int, batch: int):
    # assemble the overlapped window once: [main tile | halo rows];
    # refs are phase-major (D, B, lanes) so the fori_loop below can index
    # the phase dim dynamically (it is untiled; dynamic LANE starts would
    # need 128-alignment Mosaic cannot prove, and dynamic sublanes 8-)
    win[:, :, :tile] = xm_ref[...]
    win[:, :, tile:] = xh_ref[...]

    # loop (not unroll) over phases: a fully unrolled R*D-step FMA chain
    # leaves R*D live (batch, tile) temporaries on Mosaic's VMEM stack,
    # which OOMs compile at large batches (observed 60.7 MB at 128 lanes);
    # the loop bounds the stack to one phase's R static-shift temps
    def phase(p, acc):
        w = win[p]
        for r in range(r_rows):
            acc = acc + hr_ref[r, p] * w[:, r:r + tile]
        return acc

    out_ref[...] = jax.lax.fori_loop(
        0, decim, phase, jnp.zeros((batch, tile), jnp.float32))


def fir_decim_pallas(xc: jnp.ndarray, h: jnp.ndarray, decim: int,
                     tile: int | None = None, b_tile: int | None = None,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Batched streaming decimating FIR on the extended input.

    ``xc`` is ``[state, x]`` of shape (..., N + K - 1) (the overlap-save
    convention of ops.fir.fir_block_decim); returns (..., N // decim)
    bit-comparable to the XLA conv path.  Jit-compatible (``h`` may be
    traced); shapes/decim are static.  ``interpret`` defaults to the
    Pallas interpreter on non-TPU backends so the same code path runs
    everywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = h.shape[0]
    n_ext = xc.shape[-1]
    n = n_ext - (k - 1)
    assert n % decim == 0, (n, decim)
    n_out = n // decim
    r_rows = _cdiv(k, decim)
    assert r_rows <= _HALO, (r_rows, _HALO)

    lead = xc.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    xf = xc.reshape(b, n_ext)

    d_pad = _cdiv(decim, 8) * 8
    b_pad = _cdiv(b, 8) * 8
    bt_auto, tile_auto = _auto_tiles(b_pad, d_pad, r_rows)
    tile = tile if tile is not None else tile_auto
    bt = b_tile if b_tile is not None else bt_auto
    n_tiles = _cdiv(n_out, tile)
    n_btiles = _cdiv(b_pad, bt)
    b_full = n_btiles * bt
    xf = jnp.pad(xf, ((0, b_full - b), (0, 0)))

    # polyphase rows, phase-major leading: x2[p, b, m] = xf[b, m*decim + p]
    n_rows = n_tiles * tile + _HALO
    row_pad = n_rows * decim - n_ext
    xf = jnp.pad(xf, ((0, 0), (0, row_pad)))
    x2 = jnp.transpose(xf.reshape(b_full, n_rows, decim), (2, 0, 1))
    x2 = jnp.pad(x2, ((0, d_pad - decim), (0, 0), (0, 0)))

    # halo view: xh[..., ti*_HALO + r] = x2[..., ti*tile + tile + r]
    # (windows overlap the NEXT tile by r_rows-1 rows; gathered once here so
    # every kernel operand is a bounded pipeline block)
    hidx = (np.arange(n_tiles)[:, None] * tile + tile
            + np.arange(_HALO)[None, :])
    hidx = np.minimum(hidx, n_rows - 1).reshape(-1)
    xh = x2[:, :, jnp.asarray(hidx)]
    # grid x block must cover each operand EXACTLY: this toolchain stages
    # any not-fully-covered operand wholesale into scoped VMEM, so trim the
    # halo tail off the main operand
    x2 = x2[:, :, : n_tiles * tile]

    hr = _phase_coeffs(h, decim)
    kern = functools.partial(_kernel, tile=tile, r_rows=r_rows, decim=decim,
                             batch=bt)
    out = pl.pallas_call(
        kern,
        # lane tiles innermost: consecutive steps walk time within one
        # batch tile (best input-block pipeline locality)
        grid=(n_btiles, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # hr coefficients
            pl.BlockSpec((d_pad, bt, tile), lambda bi, ti: (0, bi, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, bt, _HALO), lambda bi, ti: (0, bi, ti),
                         memory_space=pltpu.VMEM),
        ],
        # batch rides the sublane dimension of the output block
        out_specs=pl.BlockSpec((bt, tile), lambda bi, ti: (bi, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_full, n_tiles * tile),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d_pad, bt, tile + _HALO), jnp.float32),
        ],
        interpret=interpret,
    )(hr, x2, xh)
    return out[:b, :n_out].reshape(lead + (n_out,))


def fir_block_decim_pallas(x: jnp.ndarray, h: jnp.ndarray,
                           state: jnp.ndarray, decim: int,
                           interpret: bool | None = None
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops.fir.fir_block_decim using the Pallas kernel."""
    k = h.shape[0] if hasattr(h, "shape") else len(h)
    xc = jnp.concatenate([state, x], axis=-1)
    y = fir_decim_pallas(xc, h, decim, interpret=interpret)
    new_state = xc[..., xc.shape[-1] - (k - 1):]
    return y, new_state
