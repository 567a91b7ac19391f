"""Same-session IN-CONTEXT A/B of the mixer-fused PLL kernel.

The isolated segment race (scripts/pll_race.py) shows the fused kernel
2x+ faster at every batch size — but in the full DAG the mix operands
must be materialized into the kernel's lane layout instead of fusing
into XLA's elementwise mixer, so the in-context verdict can differ (and
BENCH r5 vs r4 suggested it does at small batches).  This script times
the COMPLETE production block (process_block, auto kernels) with
``fused_mixer`` forced on/off, same session, scan-difference method.

Usage: python scripts/dag_mixer_ab.py -> docs/dag_mixer_ab_r5.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N1, N2, REPS = 4, 16, 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sdr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdr_tpu import config as cfg
    from sdr_tpu.models import receiver as rx
    from sdr_tpu.utils import synth

    configs = [(0, 32), (0, 128), (0, 512), (1, 128), (3, 128)]
    out = {"device": jax.devices()[0].device_kind,
           "platform": jax.devices()[0].platform,
           "methodology": (f"full process_block DAG, scan-difference "
                           f"(t(scan {N2})-t(scan {N1}))/{N2 - N1}, best "
                           f"of {REPS}, fused_mixer forced on/off in ONE "
                           "session"),
           "rows": []}

    for mode, C in configs:
        mc = cfg.get_mode_config(mode)
        rds = mc.rds is not None
        bs = mc.default_block_size(with_rds=rds)
        res = synth.synthesize_fm(duration_s=0.1, mode=mode,
                                  with_stereo=True, with_rds=rds, seed=0)
        iq = res.iq_u8
        if len(iq) < bs:
            iq = np.tile(iq, -(-bs // len(iq)))
        blk = jnp.asarray(np.broadcast_to(iq[:bs], (C, bs)).copy())
        coeffs = rx.design_coeffs(mc)
        st0 = rx.init_state(mc, batch_shape=(C,))
        sel = rx.auto_kernel_selectors()

        def time_variant(fused):
            times = {}
            for nb in (N1, N2):
                @jax.jit
                def scan_fn(st, b):
                    def body(c, _):
                        o, c = rx.process_block(
                            b, coeffs, c, mc, stereo=True, with_rds=rds,
                            fused_mixer=fused, **sel)
                        s = jnp.sum(o.left)
                        if rds:
                            s = s + jnp.sum(o.rds_symbols)
                        return c, s
                    c, sums = lax.scan(body, st, None, length=nb)
                    return jnp.sum(sums)
                s = float(scan_fn(st0, blk))
                assert np.isfinite(s), s
                best = float("inf")
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    float(scan_fn(st0, blk))
                    best = min(best, time.perf_counter() - t0)
                times[nb] = best
            return max(times[N2] - times[N1], 0.0) / (N2 - N1) * 1e3

        on = time_variant(True)
        off = time_variant(False)
        row = {"mode": mode, "channels": C,
               "arms": 1 + int(rds),
               "lanes": C * (1 + int(rds)),
               "fused_ms": round(on, 4), "unfused_ms": round(off, 4),
               "fused_speedup": round(off / max(on, 1e-9), 3)}
        out["rows"].append(row)
        print(f"# mode {mode} C={C:4d}: fused {on:7.4f} ms | "
              f"unfused {off:7.4f} ms | speedup {row['fused_speedup']}",
              file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "dag_mixer_ab_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
