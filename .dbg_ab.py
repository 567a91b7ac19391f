import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/sdr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sdr_tpu import config as cfg
from sdr_tpu.models import receiver as rx
from sdr_tpu.utils import synth

C = 512
print("backend:", jax.default_backend(), "device:", jax.devices()[0].device_kind,
      "platform:", jax.devices()[0].platform, flush=True)
print("_auto_pallas:", rx._auto_pallas(), flush=True)

mc = cfg.get_mode_config(0)
bs = mc.default_block_size(with_rds=True)
res = synth.synthesize_fm(duration_s=0.25, mode=0, with_stereo=True,
                          with_rds=True, seed=0)
iq = res.iq_u8
n_src = len(iq) // bs
blocks1 = [jnp.asarray(iq[b * bs:(b + 1) * bs]) for b in range(n_src)]
coeffs = rx.design_coeffs(mc)
fn = rx.make_block_fn(mc, stereo=True, with_rds=True)

# exactly the bench's aggregate path
blocksC = [jnp.asarray(np.tile(np.asarray(b), (C, 1))) for b in blocks1[:4]]
st = rx.init_state(mc, batch_shape=(C,))
out, st = fn(blocksC[0], coeffs, st)
jax.block_until_ready(out)
print("warm", flush=True)

# A: bench-style cycled blocks, chained state, block at end
for trial in range(3):
    t0 = time.perf_counter()
    last = None
    for b in range(10):
        last, st = fn(blocksC[b % 4], coeffs, st)
    jax.block_until_ready(last)
    print(f"A bench-style cycled:  {(time.perf_counter()-t0)/10*1e3:8.3f} ms/blk", flush=True)

# B: same single block every call
for trial in range(2):
    t0 = time.perf_counter()
    for b in range(10):
        last, st = fn(blocksC[0], coeffs, st)
    jax.block_until_ready(last)
    print(f"B same-block:          {(time.perf_counter()-t0)/10*1e3:8.3f} ms/blk", flush=True)

# C: synchronous (block every call)
for trial in range(2):
    t0 = time.perf_counter()
    for b in range(10):
        last, st = fn(blocksC[b % 4], coeffs, st)
        jax.block_until_ready(last)
    print(f"C synchronous cycled:  {(time.perf_counter()-t0)/10*1e3:8.3f} ms/blk", flush=True)

# D: standalone RF pallas same session
from sdr_tpu.ops import pallas_fir
key = jax.random.PRNGKey(0)
iq2 = jax.random.normal(key, (C, 2, bs // 2), jnp.float32)
st2 = jnp.zeros((C, 2, mc.rf_taps - 1), jnp.float32)

@jax.jit
def rfp(x2, s2):
    return pallas_fir.fir_block_decim_pallas(x2, coeffs.rf, s2, mc.rf_decim)

o = rfp(iq2, st2); jax.block_until_ready(o)
for trial in range(2):
    t0 = time.perf_counter()
    for _ in range(10):
        o = rfp(iq2, st2)
    jax.block_until_ready(o)
    print(f"D rf pallas standalone:{(time.perf_counter()-t0)/10*1e3:8.3f} ms/call", flush=True)

# E: rf pallas chained through state (donation-like chaining)
o, s2 = rfp(iq2, st2)
jax.block_until_ready(o)
for trial in range(2):
    t0 = time.perf_counter()
    for _ in range(10):
        o, s2 = rfp(iq2, s2)
    jax.block_until_ready(o)
    print(f"E rf pallas chained:   {(time.perf_counter()-t0)/10*1e3:8.3f} ms/call", flush=True)
