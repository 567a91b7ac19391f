"""Channel-parallel receive: a batch of independent FM stations over a mesh.

The data-parallel axis the reference lacks (SURVEY.md §2.3 "Data
parallelism (absent)"): every op in sdr_tpu.models.receiver supports leading
batch dims, so scaling to C channels over D chips is pure sharding — XLA
partitions the whole program with zero collectives on the hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdr_tpu import config as cfg
from sdr_tpu.models import receiver as rx


def channel_sharded_run(iq_channels: np.ndarray, mesh: Mesh,
                        mode: int | cfg.Mode = 0, stereo: bool = True,
                        with_rds: bool = False,
                        block_size: Optional[int] = None,
                        axis: str = "ch"):
    """Run C independent channels sharded over ``mesh`` axis ``axis``.

    ``iq_channels``: (C, n_samples) interleaved IQ — normalized float, or
    RAW uint8 straight off the SDRs (the serving shape: u8 stays u8 so the
    fused Pallas MXU front-end normalizes on-device and the host->device
    stream is a quarter of the f32 bytes).  C must be a multiple of the
    mesh axis size.  Returns (BlockOutputs, final_state) with outputs
    stacked (n_blocks, C, out_len) and every array sharded over C.
    """
    mc = cfg.get_mode_config(mode)
    with_rds = with_rds and mc.rds is not None
    if block_size is None:
        block_size = mc.default_block_size(with_rds)

    c, n = iq_channels.shape
    n_blocks = n // block_size
    blocks = iq_channels[:, : n_blocks * block_size]
    if blocks.dtype != np.uint8:
        blocks = blocks.astype(np.float32)
    blocks = np.moveaxis(blocks.reshape(c, n_blocks, block_size), 1, 0)

    sharding = NamedSharding(mesh, P(None, axis, None))
    iq_dev = jax.device_put(jnp.asarray(blocks), sharding)

    coeffs = rx.design_coeffs(mc)
    state = jax.device_put(
        rx.init_state(mc, batch_shape=(c,)),
        NamedSharding(mesh, P(axis)))

    outs, final_state = rx.run_blocks_scan(
        iq_dev, coeffs, state, int(mc.mode), stereo, with_rds)
    return outs, final_state
