"""Same-session race: fused PLL+mixer kernel vs the r4 PLL + XLA glue.

The r4 stack ran ops.pallas_pll.pll_block_fused_pallas (angle-only
kernel) and left the NCO cos/sin, the N+1 concat, and the mixer products
to XLA — full-block HBM passes the DAG ladder attributed as most of the
stereo/RDS arm glue (docs/dag_bisect.json).  Round 5's
pll_mixer_fused_pallas moves the trig + shift + mixer inside the kernel.
Both variants are timed here in ONE session with the scan-difference
methodology (CLAUDE.md: the tunnel makes cross-session timing
incomparable), on the production shapes: C channels x 2 arms x N IF
samples, mode 0.

Usage: python scripts/pll_race.py [C] -> docs/pll_race_r5.json
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
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 512

    from sdr_tpu.utils.device import ensure_reachable_backend
    ensure_reachable_backend()
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sdr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdr_tpu import config as cfg
    from sdr_tpu.models import receiver as rx
    from sdr_tpu.ops import pll as jpll
    from sdr_tpu.ops import pallas_pll as ppll

    mc = cfg.get_mode_config(0)
    n = mc.default_block_size(with_rds=True) // 2 // mc.rf_decim  # IF len
    p1, p2 = rx.pilot_pll_params(mc), rx.rds_pll_params(mc)
    rng = np.random.default_rng(0)
    t = np.arange(n) / mc.if_fs
    x1 = 0.4 * np.sin(2 * np.pi * 19010 * t)
    x2 = 0.1 * np.sin(2 * np.pi * 113985 * t)
    x = jnp.asarray(np.broadcast_to(
        np.stack([x1, x2]).astype(np.float32), (C, 2, n)).copy())
    mix = jnp.asarray(rng.standard_normal((C, 2, n)).astype(np.float32))
    st0 = jax.tree.map(
        lambda a, b: jnp.broadcast_to(jnp.stack([a, b], -1), (C, 2)),
        jpll.pll_init(), jpll.pll_init(nco_q_last=1.0))

    def variant_old(st, xx, mm):
        nco_i, _, st = ppll.pll_block_fused_pallas(xx, st, (p1, p2))
        return st, nco_i[..., :-1] * mm * 2.0

    def variant_new(st, xx, mm):
        return tuple(reversed(ppll.pll_mixer_fused_pallas(
            xx, mm, st, (p1, p2))))

    def time_variant(fn):
        times = {}
        for nb in (N1, N2):
            @jax.jit
            def scan_fn(st, xx, mm):
                def body(c, _):
                    c, mix_out = fn(c, xx, mm)
                    return c, jnp.sum(mix_out)
                c, sums = lax.scan(body, st, None, length=nb)
                return jnp.sum(sums)
            s = float(scan_fn(st0, x, mix))
            assert np.isfinite(s), s
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(scan_fn(st0, x, mix))
                best = min(best, time.perf_counter() - t0)
            times[nb] = best
        return max(times[N2] - times[N1], 0.0) / (N2 - N1) * 1e3

    res = {
        "device": jax.devices()[0].device_kind,
        "platform": jax.devices()[0].platform,
        "channels": C, "if_samples": n,
        "methodology": (f"scan-difference: (t(scan {N2}) - t(scan {N1}))"
                        f" / {N2 - N1}, best of {REPS}, one session"),
        "old_pll_plus_xla_glue_ms": round(time_variant(variant_old), 4),
        "new_fused_mixer_kernel_ms": round(time_variant(variant_new), 4),
    }
    res["speedup"] = round(res["old_pll_plus_xla_glue_ms"]
                           / max(res["new_fused_mixer_kernel_ms"], 1e-9), 3)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "pll_race_r5.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
