import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sdr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sdr_tpu import config as cfg
from sdr_tpu.models import receiver as rx
from sdr_tpu.utils import synth

mc = cfg.get_mode_config(0)
bs = mc.default_block_size(with_rds=True)
res = synth.synthesize_fm(duration_s=0.25, mode=0, with_stereo=True,
                          with_rds=True, seed=0)
iq = res.iq_u8
coeffs = rx.design_coeffs(mc)
print("backend:", jax.default_backend(), flush=True)

NB = 16
for C in (128, 512):
    src = np.stack([iq[(b % 4) * bs:((b % 4) + 1) * bs] for b in range(NB)])
    blocks = jnp.asarray(np.broadcast_to(src[:, None, :],
                                         (NB, C, bs)).copy())
    st = rx.init_state(mc, batch_shape=(C,))
    outs, st = rx.run_blocks_scan(blocks, coeffs, st, mc, True, True)
    jax.block_until_ready(outs)
    for trial in range(3):
        t0 = time.perf_counter()
        outs, st = rx.run_blocks_scan(blocks, coeffs, st, mc, True, True)
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        ms_blk = dt / NB * 1e3
        msps = C * (bs / 2) * NB / dt / 1e6
        print(f"C={C:4d} scan{NB}: {ms_blk:7.3f} ms/blk -> {msps:9.0f} MS/s agg",
              flush=True)
    # with per-dispatch host fetch of one scalar (forces real completion)
    t0 = time.perf_counter()
    outs, st = rx.run_blocks_scan(blocks, coeffs, st, mc, True, True)
    s = float(jnp.sum(outs.left))
    dt = time.perf_counter() - t0
    print(f"C={C:4d} scan{NB}+scalar-fetch: {dt/NB*1e3:7.3f} ms/blk (sum={s:.3f})",
          flush=True)
    # full output fetch to host
    t0 = time.perf_counter()
    outs, st = rx.run_blocks_scan(blocks, coeffs, st, mc, True, True)
    _ = jax.tree.map(np.asarray, outs)
    dt = time.perf_counter() - t0
    print(f"C={C:4d} scan{NB}+full-fetch:   {dt/NB*1e3:7.3f} ms/blk", flush=True)
