import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sdr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sdr_tpu import config as cfg
from sdr_tpu.models import receiver as rx
from sdr_tpu.ops import fir as jfir
from sdr_tpu.utils import synth

C = 512
print("backend:", jax.default_backend(), flush=True)
mc = cfg.get_mode_config(0)
bs = mc.default_block_size(with_rds=True)
res = synth.synthesize_fm(duration_s=0.25, mode=0, with_stereo=True,
                          with_rds=True, seed=0)
iq = res.iq_u8
blocksC = [jnp.asarray(np.tile(iq[b * bs:(b + 1) * bs], (C, 1)))
           for b in range(4)]
coeffs = rx.design_coeffs(mc)


def timeit(fn, st, label, iters=10):
    out, st2 = fn(blocksC[0], coeffs, st)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for b in range(iters):
            out, st2 = fn(blocksC[b % 4], coeffs, st2)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    msps = C * (bs / 2) / best / 1e6
    print(f"{label:28s} {best*1e3:8.3f} ms/blk  -> {msps:8.0f} MS/s agg",
          flush=True)
    return best


# new default (mxu_fir + pallas pll)
fn_mxu = rx.make_block_fn(mc, stereo=True, with_rds=True)
timeit(fn_mxu, rx.init_state(mc, batch_shape=(C,)), "mxu_fir + pallas_pll")

# mxu fir + scan pll
fn_mxu_scan = rx.make_block_fn(mc, stereo=True, with_rds=True,
                               pallas_pll=False)
timeit(fn_mxu_scan, rx.init_state(mc, batch_shape=(C,)),
       "mxu_fir + scan_pll")

# old default (pallas frontend + conv firs)
fn_old = rx.make_block_fn(mc, stereo=True, with_rds=True,
                          pallas_frontend=True, mxu_fir=False)
timeit(fn_old, rx.init_state(mc, batch_shape=(C,)), "pallas_fe + conv (r2)")

# standalone: RF mm kernel
key = jax.random.PRNGKey(0)
iq2 = jax.random.normal(key, (C, 2, bs // 2), jnp.float32)
st2 = jnp.zeros((C, 2, mc.rf_taps - 1), jnp.float32)


@jax.jit
def rfmm(x2, s2):
    return jfir.fir_block_decim_mm(x2, coeffs.rf, s2, mc.rf_decim)


o = rfmm(iq2, st2)
jax.block_until_ready(o)
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(10):
        o = rfmm(iq2, st2)
    jax.block_until_ready(o)
    print(f"rf mm standalone:            {(time.perf_counter()-t0)/10*1e3:8.3f} ms/call", flush=True)
