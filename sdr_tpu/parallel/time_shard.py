"""Time-parallel receive: one recording split across chips with halo exchange.

The reference's whole design is overlap-save streaming — every stateful op
carries a small trailing-input state (SURVEY.md §2.3 row 2).  Splitting a
long recording into S contiguous shards therefore needs each shard to start
with the state the previous shard would have handed it.  Two classes of op:

* **linear/FIR state** (FIR tails, demod last-IQ, allpass delay): fully
  determined by the last few *input* samples — covered exactly by prefixing
  each shard with an input overlap from its left neighbor (one ``ppermute``
  over ICI inside ``shard_map``).
* **sequential recurrences** (PLL; ref src/filter.cpp:52-72): state is a
  function of the whole past.  The overlap gives the PLL a re-lock runway;
  after lock the NCO converges to the same phase trajectory (the pilot is a
  physical oscillator both shards track), so outputs agree after the
  overlap to PLL-tracking tolerance, not bit-exactly (SURVEY.md §7 step 8's
  "re-lock with overlap discard" plan).

Each shard runs the SAME jitted block DAG as single-chip; the only
collective on the hot path is the single halo ``ppermute`` per program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdr_tpu import config as cfg
from sdr_tpu.models import receiver as rx


def default_block_if(mc: cfg.ModeConfig, with_rds: bool = False) -> int:
    """Smallest whole-multiple IF block length >= 5000 samples."""
    mult = mc.if_block_multiple(with_rds)
    return -(-5000 // mult) * mult


def time_sharded_receive(iq: np.ndarray, mesh: Mesh,
                         mode: int | cfg.Mode = 0, stereo: bool = True,
                         with_rds: bool = False,
                         overlap_if: Optional[int] = None,
                         axis: str = "time",
                         batch_axis: Optional[str] = None,
                         block_if: Optional[int] = None,
                         halo_impl: str = "ppermute") -> rx.BlockOutputs:
    """Process one recording time-sharded over ``mesh`` axis ``axis``.

    ``iq``: (n,) normalized interleaved IQ; n must divide evenly into
    S = mesh.shape[axis] segments, each a whole number of ``block_if``-IF
    blocks.  Within a shard the segment streams through a ``lax.scan`` of
    block steps — device memory stays O(block), so arbitrarily long
    recordings shard without materializing a segment-sized intermediate.
    ``overlap_if`` is the per-shard warm-up prefix in IF samples (default
    the smallest whole-block count >= 6k samples: beyond FIR depth with
    pilot-PLL re-lock runway); it is rounded up to whole blocks and its
    outputs are discarded.  Returns globally assembled outputs laid out
    exactly like a contiguous run.

    With ``batch_axis`` set, ``iq`` is (C, n): a channel batch sharded over
    a second mesh axis — time and channel parallelism composed on one 2D
    mesh (the dp x sp layout of SURVEY.md §2.3).

    ``halo_impl``: "ppermute" (XLA collective, default) or "pallas"
    (hand-written RDMA kernel, parallel.pallas_halo) — identical results.
    """
    mc = cfg.get_mode_config(mode)
    with_rds = with_rds and mc.rds is not None
    s = mesh.shape[axis]

    mult = mc.if_block_multiple(with_rds)
    if block_if is None:
        block_if = default_block_if(mc, with_rds)
    assert block_if % mult == 0, (block_if, mult)
    if overlap_if is None:
        overlap_if = 6000
    # overlap must be whole blocks so the scan can discard whole steps
    n_skip_blocks = -(-overlap_if // block_if)
    overlap_if = n_skip_blocks * block_if

    raw_per_if = 2 * mc.rf_decim
    block_raw = block_if * raw_per_if
    n = iq.shape[-1]
    seg = n // s
    assert seg * s == n, "recording must split evenly across shards"
    assert seg % block_raw == 0, (
        f"segment of {seg} raw samples is not a whole number of "
        f"{block_raw}-sample blocks")
    halo_raw = overlap_if * raw_per_if
    assert halo_raw <= seg, "overlap larger than a segment"
    n_blocks = seg // block_raw + n_skip_blocks

    coeffs = rx.design_coeffs(mc)
    # same kernel selection as the contiguous paths (Receiver.run /
    # run_blocks_scan auto-enable Pallas on TPU): sharded and contiguous
    # runs must pick IDENTICAL kernels or the bit-match invariant on the
    # linear arms breaks at the ~2e-5 Pallas-vs-XLA-conv level
    use_pallas = rx._auto_pallas()

    # only enabled arms are returned — zero-length placeholders cannot carry
    # a sharded PartitionSpec
    arms = ["fm_demod", "mono"]
    if stereo:
        arms += ["left", "right"]
    if with_rds:
        arms += ["rds_symbols"]

    spec = P(batch_axis, axis) if batch_axis else P(axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=spec,
        out_specs={a: spec for a in arms},
        check_vma=False)
    def run_shard(iq_local: jnp.ndarray) -> dict:
        # left neighbor's trailing halo_raw samples; shard 0 receives zeros
        tail = iq_local[..., -halo_raw:]
        if halo_impl == "pallas":
            from sdr_tpu.parallel.pallas_halo import halo_shift_right
            mesh_axes = tuple((name, mesh.shape[name])
                              for name in mesh.axis_names)
            halo = halo_shift_right(tail, axis, mesh_axes)
        else:
            halo = lax.ppermute(tail, axis,
                                [(i, i + 1) for i in range(s - 1)])
        ext = jnp.concatenate([halo, iq_local], axis=-1)
        lead = ext.shape[:-1]
        blocks = jnp.moveaxis(
            ext.reshape(lead + (n_blocks, block_raw)), -2, 0)
        init = rx.init_state(mc, batch_shape=lead)

        def step(st, blk):
            out, st = rx.process_block(blk, coeffs, st, mc, stereo=stereo,
                                       with_rds=with_rds,
                                       pallas_frontend=use_pallas,
                                       pallas_pll=use_pallas)
            return st, {a: out._asdict()[a] for a in arms}

        # warm-up scan over the halo blocks (outputs discarded)
        warm_state, _ = lax.scan(step, init, blocks[:n_skip_blocks])
        # shard 0's halo is zeros, which warms the FIR states correctly but
        # walks the PLL (zero input still advances its oscillator): reset
        # shard 0 to the EXACT fresh state a contiguous run starts from
        is_first = lax.axis_index(axis) == 0
        state = jax.tree.map(
            lambda i0, w: jnp.where(is_first, i0, w), init, warm_state)
        _, outs = lax.scan(step, state, blocks[n_skip_blocks:])
        # flatten time: (n_blk, ..., per) -> (..., n_blk * per)
        kept = {}
        for a in arms:
            o = jnp.moveaxis(outs[a], 0, -2)
            kept[a] = o.reshape(lead + (-1,))
        return kept

    sharding = NamedSharding(mesh, spec)
    iq_dev = jax.device_put(jnp.asarray(iq, dtype=jnp.float32), sharding)
    res = run_shard(iq_dev)
    empty = jnp.zeros((0,), jnp.float32)
    return rx.BlockOutputs(**{f: res.get(f, empty)
                              for f in rx.BlockOutputs._fields})
