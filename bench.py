"""Headline benchmark: full stereo+RDS receiver throughput on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: sustained raw-IQ throughput (Msamples/s of IQ pairs) through the
complete mode-0 receiver DAG — RF front-end, mono, stereo (pilot PLL),
RDS to soft symbols — streamed block-by-block with carried state, exactly
the reference's operating regime.

Baseline: the reference runs REAL-TIME at its input rate, 2.4 MS/s, on a
Raspberry Pi 4 (BASELINE.md: mode-0 budget 21.33 ms per 51,200-pair block,
src/project.cpp:55) — and that is mono+stereo only; RDS never ran
real-time at all ("RDS modeled in Python only",
doc/3dy4_project_disclosure.pdf).  vs_baseline = throughput / 2.4 MS/s.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    # persistent compile cache: repeat bench runs skip XLA compilation
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/sdr_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp

    from sdr_tpu import config as cfg
    from sdr_tpu.models import receiver as rx
    from sdr_tpu.utils import synth

    mc = cfg.get_mode_config(0)
    bs = mc.default_block_size(with_rds=True)

    # realistic input: synthesized FM station, cycled over blocks
    res = synth.synthesize_fm(duration_s=0.25, mode=0, with_stereo=True,
                              with_rds=True, seed=0)
    iq = synth.u8_to_float(res.iq_u8)
    n_src = len(iq) // bs
    blocks = [jnp.asarray(iq[b * bs:(b + 1) * bs], jnp.float32)
              for b in range(n_src)]

    coeffs = rx.design_coeffs(mc)
    fn = rx.make_block_fn(mc, stereo=True, with_rds=True)

    # warm-up: compile + 3 blocks
    state = rx.init_state(mc)
    t0 = time.time()
    out, state = fn(blocks[0], coeffs, state)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    for b in range(1, 4):
        out, state = fn(blocks[b % n_src], coeffs, state)
    jax.block_until_ready(out)

    # timed steady-state streaming (state threads block-to-block)
    n_timed = 200
    t0 = time.time()
    last = None
    for b in range(n_timed):
        last, state = fn(blocks[b % n_src], coeffs, state)
    jax.block_until_ready(last)
    dt = time.time() - t0

    assert np.isfinite(np.asarray(last.left)).all()
    iq_pairs = n_timed * (bs // 2)
    msps = iq_pairs / dt / 1e6
    baseline_msps = 2.4  # reference real-time input rate on RPi 4

    print(json.dumps({
        "metric": "stereo_rds_iq_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / baseline_msps, 1),
    }))
    print(f"# device={jax.devices()[0].device_kind} block={bs} "
          f"blocks={n_timed} compile={compile_s:.1f}s "
          f"per_block={dt / n_timed * 1e3:.3f}ms "
          f"realtime_budget={bs / 2 / mc.rf_fs * 1e3:.2f}ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
