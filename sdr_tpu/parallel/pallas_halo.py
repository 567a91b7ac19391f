"""Pallas RDMA halo exchange for time sharding (SURVEY.md §7 step 7).

The time-sharded receiver needs exactly one collective: every shard hands
its trailing ``halo`` input samples to its right neighbor
(parallel.time_shard).  The default implementation is ``lax.ppermute``;
this module provides the same semantics as a hand-written Pallas kernel
using ``make_async_remote_copy`` over the inter-chip interconnect — the
pattern that scales to overlapping the halo transfer with compute on
multi-chip slices (pallas_guide.md "Async Remote DMA").

Semantics match ``lax.ppermute(x, axis, [(i, i+1) for i in range(S-1)])``:
shard k returns shard k-1's tail; shard 0 returns zeros.  (The ring still
physically sends S-1 -> 0 so every device's semaphores pair up; shard 0
discards the payload.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(in_ref, out_ref, send_sem, recv_sem, *, axis: str,
                 axis_size: int):
    my = lax.axis_index(axis)
    right = lax.rem(my + 1, axis_size)
    rdma = pltpu.make_async_remote_copy(
        src_ref=in_ref, dst_ref=out_ref,
        send_sem=send_sem, recv_sem=recv_sem,
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    rdma.start()
    rdma.wait()

    # shard 0 has no left neighbor: its received payload (from the ring
    # wrap) is replaced by zeros, matching the non-wrapping ppermute
    @pl.when(my == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)


def halo_shift_right(x_tail: jnp.ndarray, axis: str, axis_size: int,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Inside shard_map: return the left neighbor's ``x_tail``
    (zeros on shard 0).  ``x_tail`` is the local trailing halo, any
    leading dims allowed; the last dim should be a multiple of 128 for
    the compiled TPU path (interpret mode has no constraint).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_halo_kernel, axis=axis, axis_size=axis_size)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x_tail.shape, x_tail.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=7),
        interpret=interpret,
    )(x_tail)
