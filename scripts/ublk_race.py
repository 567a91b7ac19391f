"""Race the interleaved Pallas front-end's window block size (u_blk).

For decim=10/K=151 the halo must be a 128-multiple dividing the stride
that covers K-decim=141 lanes: u_blk=64 forces hb=640 (the whole
stride), ~20 weight rows per output column, while u_blk=128 gets hb=256
(~12 rows/col) and u_blk=256 gets hb=256 (~11 rows/col) at the cost of a
larger VMEM-resident weight block.  FLOP count says bigger blocks win;
VMEM pressure and batch-tile shrinkage say smaller.  Measure, don't
guess.

Usage: python scripts/ublk_race.py [--channels 512,1024]
Writes docs/ublk_race_r4.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N1 = 4
N2 = 16
REPS = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", default="512,1024")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from sdr_tpu.utils.device import ensure_reachable_backend
    ensure_reachable_backend()
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sdr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdr_tpu import config as cfg
    from sdr_tpu.models import receiver as rx
    from sdr_tpu.ops import pallas_fir_mxu as pfm
    from sdr_tpu.utils import synth

    mc = cfg.get_mode_config(0)
    bs = mc.default_block_size(with_rds=True)
    res = synth.synthesize_fm(duration_s=0.1, mode=0, with_stereo=True,
                              with_rds=True, seed=0)
    coeffs = rx.design_coeffs(mc)
    k = int(coeffs.rf.shape[0])

    def scan_diff(step, state0, data=()):
        # inputs as explicit jit args: closed-over device arrays embed
        # into the program and trip the remote-compile body cap (HTTP 413)
        times = {}
        for n in (N1, N2):
            @jax.jit
            def scan_fn(st, *ds):
                def body(c, _):
                    c, s = step(c, *ds)
                    return c, s
                c, sums = lax.scan(body, st, None, length=n)
                return jnp.sum(sums)
            s = float(scan_fn(state0, *data))
            assert np.isfinite(s), s
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(scan_fn(state0, *data))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return max(times[N2] - times[N1], 0.0) / (N2 - N1) * 1e3

    result = {"device": jax.devices()[0].device_kind,
              "mode": 0, "rf_taps": k, "rf_decim": mc.rf_decim,
              "timings_ms": {}}
    for C in [int(c) for c in args.channels.split(",") if c]:
        blk_u8 = jnp.asarray(np.tile(res.iq_u8[:bs], (C, 1)))
        st0 = jnp.zeros((C, 2, k - 1), jnp.float32)
        row = {}
        for u_blk in (64, 128, 256):
            try:
                pfm._halo_lanes_u(mc.rf_decim, k, u_blk)
            except ValueError:
                continue

            def step(st2, blk, u=u_blk):
                y, st2 = pfm.fir_frontend_u8_pallas_int(
                    blk, coeffs.rf, st2, mc.rf_decim, u_blk=u)
                return st2, jnp.sum(y)
            row[str(u_blk)] = round(scan_diff(step, st0, (blk_u8,)), 4)
            print(f"# C={C:5d} u_blk={u_blk:4d}: {row[str(u_blk)]:8.4f} ms",
                  file=sys.stderr)
        result["timings_ms"][str(C)] = row

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "ublk_race_r4.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
