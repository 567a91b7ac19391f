"""Pallas TPU kernel: fused batched decimating FIR (the hottest kernel).

The reference's rank-1 hot loop is the RF front-end's I/Q decimating FIR at
2.4 MS/s (convolveBlockFastFIR, src/filter.cpp:158-188; ~128 ms of a
~290 ms mono block budget, report Table 3).  This kernel computes

    y[b, j] = sum_u h_rev[u] * xc[b, j*D + u],   h_rev[u] = h[K-1-u]

for a batch of channels in one pass, with a layout chosen for the TPU's
(sublane, lane) tiling:

* the padded input is reshaped to polyphase rows and TRANSPOSED to
  ``(B, D, n_out + R)`` so the long (time) axis lies along lanes;
* each grid program DMAs one ``(D, tile + R)`` window from HBM into VMEM
  and accumulates R*D scalar-coefficient x lane-vector FMAs — every
  operand stays in lane orientation, no relayouts anywhere;
* coefficients live in SMEM (R*D scalars), streamed by the scalar core.

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


def _kernel(hr_ref, x2_ref, out_ref, scratch, sem, *, tile: int,
            r_rows: int, decim: int, batch: int, win: int):
    ti = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x2_ref.at[:, :, pl.ds(ti * tile, win)], scratch, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros((batch, tile), jnp.float32)
    for r in range(r_rows):
        for p in range(decim):
            c = hr_ref[r, p]
            acc = acc + c * scratch[:, p, pl.ds(r, tile)]
    out_ref[...] = acc


#: VMEM budget for the DMA scratch window (the chip has ~16 MB/core; leave
#: room for the output block and double buffering).
_SCRATCH_BUDGET_BYTES = 4 << 20


def frontend_fits_vmem(batch: int, decim: int) -> bool:
    """True when the kernel's smallest scratch window fits the VMEM budget
    for this batch size — callers fall back to the XLA conv otherwise."""
    d_rows = _cdiv(decim, 8) * 8
    return batch * d_rows * (256 + 128) * 4 <= _SCRATCH_BUDGET_BYTES


def fir_decim_pallas(xc: jnp.ndarray, h: jnp.ndarray, decim: int,
                     tile: int | None = None,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Batched streaming decimating FIR on the extended input.

    ``xc`` is ``[state, x]`` of shape (..., N + K - 1) (the overlap-save
    convention of ops.fir.fir_block_decim); returns (..., N // decim)
    bit-comparable to the XLA conv path.  Jit-compatible (``h`` may be
    traced); shapes/decim are static.  ``interpret`` defaults to the
    Pallas interpreter on non-TPU backends so the same code path runs
    everywhere.  ``tile`` defaults to the largest lane tile whose
    ``(batch, decim, tile)`` scratch window fits the VMEM budget, so big
    channel batches shrink the tile instead of blowing VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = h.shape[0]
    n_ext = xc.shape[-1]
    n = n_ext - (k - 1)
    assert n % decim == 0, (n, decim)
    n_out = n // decim
    r_rows = _cdiv(k, decim)

    lead = xc.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    xf = xc.reshape(b, n_ext)

    if tile is None:
        d_rows = _cdiv(decim, 8) * 8
        budget_lanes = _SCRATCH_BUDGET_BYTES // (b * d_rows * 4)
        tile = int(np.clip((budget_lanes - r_rows) // 128 * 128, 256, 2048))

    n_tiles = _cdiv(n_out, tile)
    # rows must reach index (n_out + r_rows - 1); lanes must reach the last
    # tile's DMA window; Mosaic wants the sublane (phase) dim 8-aligned and
    # DMA windows lane(128)-aligned
    d_pad = _cdiv(decim, 8) * 8
    win = _cdiv(tile + r_rows, 128) * 128
    row_pad = (n_out + r_rows) * decim - n_ext
    xf = jnp.pad(xf, ((0, 0), (0, row_pad)))
    x2 = xf.reshape(b, n_out + r_rows, decim).swapaxes(1, 2)
    lane_pad = (n_tiles - 1) * tile + win - (n_out + r_rows)
    x2 = jnp.pad(x2, ((0, 0), (0, d_pad - decim), (0, lane_pad)))

    hr = _phase_coeffs(h, decim)
    kern = functools.partial(_kernel, tile=tile, r_rows=r_rows, decim=decim,
                             batch=b, win=win)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # hr coefficients
            pl.BlockSpec(memory_space=pl.ANY),       # x2 stays in HBM
        ],
        # batch rides the sublane dimension: block covers all rows
        out_specs=pl.BlockSpec((b, tile), lambda ti: (0, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b, d_pad, win), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(hr, x2)
    return out[:, :n_out].reshape(lead + (n_out,))


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
