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
