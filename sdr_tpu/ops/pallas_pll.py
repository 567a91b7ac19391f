"""Pallas TPU kernel: the PLL recurrence (the receiver's serial bottleneck).

The PLL's per-sample dependency chain (ref fmPll, src/filter.cpp:32-80)
cannot be parallelized over time, so its cost is (steps x per-step
overhead).  As a ``lax.scan`` the per-step overhead is XLA's loop-body
dispatch (~1 us/sample measured on v5e — unroll-independent); inside one
Pallas kernel the same ~15 elementwise ops compile to straight-line VPU
code with no per-op scheduling, an order of magnitude less per step.

Layout: time is the sequential axis; the (batch x PLL-arm) product rides
the VPU lanes — one vreg row holds up to 128 independent PLLs stepping in
lockstep (the channel-parallel serving regime at zero extra cost).  The
per-arm loop constants (kp/ki/w/modulus) are per-lane vectors, so *different*
PLLs (19 kHz pilot, 114 kHz RDS carrier) share the kernel exactly like
ops.pll.pll_block_fused.

The recurrence emits only the oscillator angle; all trig (the x1 feedback
cos/sin never being needed at all, and the x``nco_scale`` output cos/sin)
is evaluated *outside* the kernel, vectorized over the whole block —
identical math to ops.pll._pll_scan_free, to tolerance of instruction
scheduling (FMA fusion), which tests gate at 1e-4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.ops.pll import PllParams, PllState, _CI, _CP

_PI = float(np.pi)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(x_ref, c0_ref, const_ref, args_ref, cout_ref, carry, *,
            tile_t: int, total_t: int):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        carry[...] = c0_ref[...]

    kp = const_ref[0]
    ki = const_ref[1]
    w = const_ref[2]
    m = const_ref[3]
    integ0, phase0, psi0, aw0 = (carry[0], carry[1], carry[2], carry[3])
    two_pi = 2.0 * _PI

    def step(t, c):
        integ, phase, psi, aw = c
        xk = x_ref[t]
        err_pos = -aw
        err_neg = jnp.where(aw > 0, _PI - aw, -_PI - aw)
        err_zero = jnp.where(jnp.abs(aw) < _PI / 2, 0.0,
                             jnp.where(aw > 0, -_PI, _PI))
        err = jnp.where(xk > 0, err_pos,
                        jnp.where(xk < 0, err_neg, err_zero))
        integ = integ + ki * err
        phase = phase + kp * err + integ
        phase = phase - m * jnp.floor(phase / m)
        psi = psi + w
        psi = psi - m * jnp.floor(psi / m)
        arg = psi + phase
        args_ref[t] = arg
        aw = arg - two_pi * jnp.floor(arg / two_pi + 0.5)
        return (integ, phase, psi, aw)

    # the last tile runs only the remaining steps (args beyond total_t are
    # left as garbage and sliced off by the caller)
    nt = jnp.minimum(tile_t, total_t - ti * tile_t)
    integ, phase, psi, aw = jax.lax.fori_loop(
        0, nt, step, (integ0, phase0, psi0, aw0))
    carry[0], carry[1], carry[2], carry[3] = integ, phase, psi, aw
    cout_ref[...] = carry[...]


def _pll_args_pallas(xs: jnp.ndarray, carry0: jnp.ndarray,
                     consts: jnp.ndarray, tile_t: int,
                     interpret: bool | None) -> tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """Low-level driver: xs (T, S, 128), carry0/consts (4, S, 128) ->
    (args (T, S, 128), carry_out (4, S, 128))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t_total, s, lanes = xs.shape
    n_tiles = _cdiv(t_total, tile_t)
    pad = n_tiles * tile_t - t_total
    if pad:
        xs = jnp.pad(xs, ((0, pad), (0, 0), (0, 0)))

    kern = functools.partial(_kernel, tile_t=tile_t, total_t=t_total)
    args, cout = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_t, s, lanes), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # carry0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # consts
        ],
        out_specs=[
            pl.BlockSpec((tile_t, s, lanes), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile_t, s, lanes), jnp.float32),
            jax.ShapeDtypeStruct((4, s, lanes), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((4, s, lanes), jnp.float32)],
        interpret=interpret,
    )(xs, carry0, consts)
    return args[:t_total], cout


def pll_block_fused_pallas(x: jnp.ndarray, state: PllState,
                           params_seq: tuple[PllParams, ...],
                           tile_t: int = 1440,
                           interpret: bool | None = None
                           ) -> tuple[jnp.ndarray, jnp.ndarray, PllState]:
    """Drop-in for ops.pll.pll_block_fused on the Pallas kernel.

    ``x``: (..., K, N) with row k driven by ``params_seq[k]``; state leaves
    (..., K).  Returns (nco_i, nco_q, new_state) with the reference's N+1
    output convention.  ``interpret`` defaults to the Pallas interpreter on
    non-TPU backends.
    """
    k = len(params_seq)
    assert x.shape[-2] == k, (x.shape, k)
    n = x.shape[-1]
    lead = x.shape[:-2]
    nl = int(np.prod(lead)) if lead else 1
    l_total = nl * k
    lanes = 128
    s = _cdiv(l_total, lanes)
    l_pad = s * lanes - l_total
    # large channel batches widen the sublane dim; shrink the time tile so
    # the (tile_t, S, 128) VMEM blocks stay within budget
    tile_t = max(128, min(tile_t, tile_t * 2 // max(s, 1)))

    def to_lanes(a):           # (..., K) -> (S, 128)
        flat = a.reshape(l_total)
        return jnp.pad(flat, (0, l_pad)).reshape(s, lanes)

    # time-major lanes: (T, S, 128)
    xs = jnp.moveaxis(x.reshape(l_total, n), -1, 0)
    xs = jnp.pad(xs, ((0, 0), (0, l_pad))).reshape(n, s, lanes)
    xs = xs.astype(jnp.float32)

    vec = lambda f: jnp.tile(
        jnp.asarray([f(p) for p in params_seq], jnp.float32), nl)
    consts = jnp.stack([
        to_lanes(vec(lambda p: p.norm_bandwidth * _CP)),
        to_lanes(vec(lambda p: p.norm_bandwidth ** 2 * _CI)),
        to_lanes(vec(lambda p: 2.0 * np.pi * p.freq / p.fs)),
        to_lanes(vec(lambda p: p.wrap_modulus)),
    ])
    aw0 = jnp.arctan2(state.feedback_q, state.feedback_i)
    carry0 = jnp.stack([to_lanes(state.integrator.astype(jnp.float32)),
                        to_lanes(state.phase_est.astype(jnp.float32)),
                        to_lanes(state.osc_phase.astype(jnp.float32)),
                        to_lanes(aw0.astype(jnp.float32))])

    args3, cout = _pll_args_pallas(xs, carry0, consts, tile_t, interpret)

    def from_lanes(a):          # (S, 128) -> (..., K)
        return a.reshape(s * lanes)[:l_total].reshape(lead + (k,))

    args = jnp.moveaxis(
        args3.reshape(n, s * lanes)[:, :l_total], 0, -1
    ).reshape(lead + (k, n))
    scale = jnp.asarray([p.nco_scale for p in params_seq], jnp.float32)
    adj = jnp.asarray([p.phase_adjust for p in params_seq], jnp.float32)
    outs_i = jnp.cos(args * scale[..., None] + adj[..., None])
    outs_q = jnp.sin(args * scale[..., None] + adj[..., None])
    nco_i = jnp.concatenate([state.nco_last[..., None], outs_i], axis=-1)
    nco_q = jnp.concatenate([state.nco_q_last[..., None], outs_q], axis=-1)
    aw_last = from_lanes(cout[3])
    new_state = PllState(from_lanes(cout[0]), from_lanes(cout[1]),
                         from_lanes(cout[2]), jnp.cos(aw_last),
                         jnp.sin(aw_last), nco_i[..., -1], nco_q[..., -1])
    return nco_i, nco_q, new_state


def pll_block_pallas(x: jnp.ndarray, state: PllState, params: PllParams,
                     tile_t: int = 1440,
                     interpret: bool | None = None
                     ) -> tuple[jnp.ndarray, jnp.ndarray, PllState]:
    """Drop-in for ops.pll.pll_block (single PLL) on the Pallas kernel."""
    st1 = jax.tree.map(lambda l: l[..., None], state)
    i1, q1, st1 = pll_block_fused_pallas(x[..., None, :], st1, (params,),
                                         tile_t=tile_t, interpret=interpret)
    return (i1[..., 0, :], q1[..., 0, :],
            jax.tree.map(lambda l: l[..., 0], st1))


# ---------------------------------------------------------------------------
# PLL + NCO trig + mixer, fully fused (round 5).
#
# The plain kernel above emits the oscillator angle and leaves the NCO
# cos/sin, the N+1 concat, and the mixer product to XLA — four full-block
# HBM passes that the r4 DAG ladder measured as most of the stereo/RDS arm
# glue (docs/dag_bisect.json: ~0.3 ms of the +pilot-PLL rung at C=512 is
# this plumbing, not the recurrence).  Here the mixer operand (the signal
# the NCO multiplies: stereo band for the pilot arm, src/project.cpp:
# 246-248; delayed RDS channel for the carrier arm, model/fmRDS.py:241)
# rides into the kernel in the SAME lane layout as its PLL arm, the NCO
# cos runs in-kernel per tile (vectorized on the VPU after the serial
# loop, overlapped with the next tile's DMA), and only the finished mixer
# product leaves: `args`/cos/sin/concat never touch HBM.
#
# The reference's N+1 output convention (mixer uses nco[:-1], i.e. output
# t multiplies the NCO of sample t-1, with t=0 taking the carried
# nco_last — model/stereo.py:226) becomes a one-row shift within each
# tile, seeded from a carried "previous NCO" scratch row.
# ---------------------------------------------------------------------------


def _mix_kernel(xm_ref, c0_ref, const_ref, mix_ref, cout_ref, carry,
                args_scr, *, tile_t: int, total_t: int, s: int):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        carry[...] = c0_ref[...]

    kp = const_ref[0]
    ki = const_ref[1]
    w = const_ref[2]
    m = const_ref[3]
    scale = const_ref[4]
    adj = const_ref[5]
    integ0, phase0, psi0, aw0 = (carry[0], carry[1], carry[2], carry[3])
    two_pi = 2.0 * _PI

    def step(t, c):
        integ, phase, psi, aw = c
        xk = xm_ref[t, 0:s]
        err_pos = -aw
        err_neg = jnp.where(aw > 0, _PI - aw, -_PI - aw)
        err_zero = jnp.where(jnp.abs(aw) < _PI / 2, 0.0,
                             jnp.where(aw > 0, -_PI, _PI))
        err = jnp.where(xk > 0, err_pos,
                        jnp.where(xk < 0, err_neg, err_zero))
        integ = integ + ki * err
        phase = phase + kp * err + integ
        phase = phase - m * jnp.floor(phase / m)
        psi = psi + w
        psi = psi - m * jnp.floor(psi / m)
        arg = psi + phase
        args_scr[t] = arg
        aw = arg - two_pi * jnp.floor(arg / two_pi + 0.5)
        return (integ, phase, psi, aw)

    nt = jnp.minimum(tile_t, total_t - ti * tile_t)
    integ, phase, psi, aw = jax.lax.fori_loop(
        0, nt, step, (integ0, phase0, psi0, aw0))
    carry[0], carry[1], carry[2], carry[3] = integ, phase, psi, aw

    # vectorized tail: NCO trig + one-sample shift + mixer, all in VMEM.
    # Rows >= nt of the final tile hold stale scratch and are sliced off
    # by the caller; the shift only reads rows < nt for valid outputs.
    args = args_scr[...]                       # (tile_t, S, 128)
    nco = jnp.cos(args * scale + adj)
    prev = carry[4]                            # NCO of the last prior sample
    shifted = jnp.concatenate([prev[None], nco[:-1]], axis=0)
    mix_ref[...] = shifted * xm_ref[:, s:] * 2.0
    # dynamic indexing must go through a REF on Mosaic (dynamic_slice of a
    # computed array is unsupported): reload the final valid row from the
    # args scratch and redo its (one-row) cos
    last_args = args_scr[pl.ds(nt - 1, 1)][0]
    carry[4] = jnp.cos(last_args * scale + adj)
    carry[5] = last_args
    cout_ref[...] = carry[...]


def pll_mixer_fused_pallas(x: jnp.ndarray, mix: jnp.ndarray,
                           state: PllState,
                           params_seq: tuple[PllParams, ...],
                           tile_t: int = 1440,
                           interpret: bool | None = None
                           ) -> tuple[jnp.ndarray, PllState]:
    """Fused PLL recurrence + NCO trig + mixer product in ONE kernel.

    ``x``: (..., K, N) PLL inputs with row k driven by ``params_seq[k]``;
    ``mix``: (..., K, N) mixer operands.  Returns ``(mixer, new_state)``
    with ``mixer[..., k, :] == nco_k[..., :-1] * mix[..., k, :] * 2``
    exactly as the unfused path computes it (ops.pll.pll_block_fused
    followed by the receiver's mixer lines) — same math, but the NCO
    arrays are never materialized in HBM.  ``new_state`` keeps the full
    PllState contract incl. nco_q_last (= sin of the last output arg,
    computed outside the kernel from the carried final angle).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = len(params_seq)
    assert x.shape[-2] == k and mix.shape == x.shape, (x.shape, mix.shape, k)
    n = x.shape[-1]
    lead = x.shape[:-2]
    nl = int(np.prod(lead)) if lead else 1
    l_total = nl * k
    lanes = 128
    s = _cdiv(l_total, lanes)
    l_pad = s * lanes - l_total
    # VMEM per time-row: xm (2S rows, double-buffered), mixer out (S rows,
    # double-buffered), args scratch (S rows) -> 7*S*128 floats
    per_t = 7 * s * lanes * 4
    tile_t = min(tile_t, max(128, (8 * 2 ** 20 // per_t) & ~7))

    def to_lanes(a):           # (..., K) -> (S, 128)
        flat = a.reshape(l_total)
        return jnp.pad(flat, (0, l_pad)).reshape(s, lanes)

    # one relayout for BOTH streams: stack -> time-major -> (N, 2S, 128)
    # with rows [0:S] the PLL inputs and [S:2S] the lane-aligned mixer
    # operands (same b*K+k flattening on both, so lane j's operand is
    # lane j's arm)
    both = jnp.stack([x.reshape(l_total, n), mix.reshape(l_total, n)])
    both = jnp.pad(both, ((0, 0), (0, l_pad), (0, 0)))
    xm = jnp.moveaxis(both, -1, 0).reshape(n, 2 * s, lanes)
    xm = xm.astype(jnp.float32)
    n_tiles = _cdiv(n, tile_t)
    pad = n_tiles * tile_t - n
    if pad:
        xm = jnp.pad(xm, ((0, pad), (0, 0), (0, 0)))

    vec = lambda f: jnp.tile(
        jnp.asarray([f(p) for p in params_seq], jnp.float32), nl)
    consts = jnp.stack([
        to_lanes(vec(lambda p: p.norm_bandwidth * _CP)),
        to_lanes(vec(lambda p: p.norm_bandwidth ** 2 * _CI)),
        to_lanes(vec(lambda p: 2.0 * np.pi * p.freq / p.fs)),
        to_lanes(vec(lambda p: p.wrap_modulus)),
        to_lanes(vec(lambda p: p.nco_scale)),
        to_lanes(vec(lambda p: p.phase_adjust)),
    ])
    aw0 = jnp.arctan2(state.feedback_q, state.feedback_i)
    zero = jnp.zeros((s, lanes), jnp.float32)
    carry0 = jnp.stack([to_lanes(state.integrator.astype(jnp.float32)),
                        to_lanes(state.phase_est.astype(jnp.float32)),
                        to_lanes(state.osc_phase.astype(jnp.float32)),
                        to_lanes(aw0.astype(jnp.float32)),
                        to_lanes(state.nco_last.astype(jnp.float32)),
                        zero])

    kern = functools.partial(_mix_kernel, tile_t=tile_t, total_t=n, s=s)
    mixer3, cout = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_t, 2 * s, lanes), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # carry0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # consts
        ],
        out_specs=[
            pl.BlockSpec((tile_t, s, lanes), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * tile_t, s, lanes), jnp.float32),
            jax.ShapeDtypeStruct((6, s, lanes), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((6, s, lanes), jnp.float32),
                        pltpu.VMEM((tile_t, s, lanes), jnp.float32)],
        interpret=interpret,
    )(xm, carry0, consts)

    def from_lanes(a):          # (S, 128) -> (..., K)
        return a.reshape(s * lanes)[:l_total].reshape(lead + (k,))

    mixer = jnp.moveaxis(
        mixer3[:n].reshape(n, s * lanes)[:, :l_total], 0, -1
    ).reshape(lead + (k, n))
    scale = jnp.asarray([p.nco_scale for p in params_seq], jnp.float32)
    adj = jnp.asarray([p.phase_adjust for p in params_seq], jnp.float32)
    aw_last = from_lanes(cout[3])
    last_arg = from_lanes(cout[5])
    new_state = PllState(from_lanes(cout[0]), from_lanes(cout[1]),
                         from_lanes(cout[2]), jnp.cos(aw_last),
                         jnp.sin(aw_last), from_lanes(cout[4]),
                         jnp.sin(last_arg * scale + adj))
    return mixer, new_state
