import time, functools
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/sdr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax
from sdr_tpu import config as cfg
from sdr_tpu.models import receiver as rx

def log(*a): print(*a, flush=True)
mc = cfg.get_mode_config(0)
bs = mc.default_block_size(True)
rng = np.random.default_rng(0)
coeffs = rx.design_coeffs(mc)
NB = 40
blocks = jnp.asarray(rng.integers(0, 256, (NB, bs), dtype=np.uint8))
state0 = rx.init_state(mc)

def variant(pfe, ppll, label):
    @jax.jit
    def g(blks, st):
        def step(s, iq):
            o, s = rx.process_block(iq, coeffs, s, mc, stereo=True,
                                    with_rds=True, pallas_frontend=pfe,
                                    pallas_pll=ppll)
            return s, (jnp.sum(o.left) + jnp.sum(o.rds_symbols))
        s, outs = lax.scan(step, st, blks)
        return jnp.sum(outs)
    t0 = time.perf_counter()
    v = float(g(blocks, state0))
    ct = time.perf_counter() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        v = float(g(blocks, state0))
        best = min(best, time.perf_counter() - t0)
    log(f"{label}: {best/NB*1e3:7.3f} ms/blk (compile {ct:.0f}s)")

variant(False, False, "xla-only      ")
variant(False, True,  "pallas-pll    ")
variant(True,  True,  "pallas-both   ")
