"""Pallas RDMA halo exchange for time sharding (SURVEY.md §7 step 7).

The time-sharded receiver needs exactly one collective: every shard hands
its trailing ``halo`` input samples to its right neighbor
(parallel.time_shard).  The default implementation is ``lax.ppermute``;
this module provides the same semantics as a hand-written Pallas kernel
using ``make_async_remote_copy`` over the inter-chip interconnect — the
pattern that scales to overlapping the halo transfer with compute on
multi-chip slices (pallas_guide.md "Async Remote DMA").

Semantics match ``lax.ppermute(x, axis, [(i, i+1) for i in range(S-1)])``
on an arbitrary mesh: shard k (along ``axis``, within its row of any other
mesh axes) returns shard k-1's tail; shard 0 returns zeros.  (The ring
still physically sends k=S-1 -> k=0 within each row so every device's
semaphores pair up; the k=0 shards discard the payload.)
"""

from __future__ import annotations

import functools
import math

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

    # the axis-0 shard has no left neighbor: its received payload (from
    # the ring wrap) is replaced by zeros, matching the non-wrapping
    # ppermute
    @pl.when(my == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)


def halo_shift_right(x_tail: jnp.ndarray, axis: str,
                     mesh_axes: tuple[tuple[str, int], ...],
                     interpret: bool | None = None) -> jnp.ndarray:
    """Inside shard_map: return the left neighbor's ``x_tail`` along
    ``axis`` (zeros on the first shard).  ``mesh_axes`` is the full mesh
    layout as ((name, size), ...).

    Limitation: JAX's dma_start lowering only supports LOGICAL device ids
    on single-axis meshes (NotImplementedError otherwise), so this kernel
    requires a 1D mesh — use the ppermute halo (the default) on composed
    channel x time meshes.  The last dim is padded to a multiple of 128
    internally for the compiled TPU path.
    """
    mesh_axes = tuple(mesh_axes)
    if len(mesh_axes) != 1:
        raise NotImplementedError(
            "pallas halo exchange supports 1D meshes only (JAX dma_start "
            "LOGICAL device ids); use halo_impl='ppermute' on "
            f"multi-axis meshes (got {[n for n, _ in mesh_axes]})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = x_tail.shape[-1]
    n_pad = math.ceil(n / 128) * 128
    if n_pad != n:
        pad = [(0, 0)] * (x_tail.ndim - 1) + [(0, n_pad - n)]
        x_tail = jnp.pad(x_tail, pad)
    kern = functools.partial(_halo_kernel, axis=axis,
                             axis_size=dict(mesh_axes)[axis])
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x_tail.shape, x_tail.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=7),
        interpret=interpret,
    )(x_tail)
    return out[..., :n]
