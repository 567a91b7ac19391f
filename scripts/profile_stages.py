"""Per-stage device-time attribution for the channel-batched serving regime.

VERDICT r2 #1 asked where the serving-regime block time goes.  Round 3
found the prior answer unmeasurable by per-dispatch host timing: the dev
chip sits behind a tunnel whose dispatch latency is large and bimodal
session-to-session AND whose ``block_until_ready`` does not reliably wait
(the same compiled program "measured" 24 ms/block and 0.14 ms/block in
two sessions).  This harness therefore times every stage by the
**scan-difference method**: each stage runs as a jitted ``lax.scan`` of
N1 and then N2 state-chained steps over one closed-over input block,
ending in a fetched scalar (true sync);

    per_step = (t(N2) - t(N1)) / (N2 - N1)

cancels all constant tunnel/dispatch/fetch terms.  Stages measured in
both their kernel variants (MXU banded-matmul vs XLA conv vs Pallas)
attribute the full-DAG time and justify the receiver's kernel defaults.

Usage: python scripts/profile_stages.py [C] [--mode M]
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
    ap.add_argument("channels", nargs="?", type=int, default=512)
    ap.add_argument("--mode", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    C = args.channels

    from sdr_tpu.utils.device import ensure_reachable_backend
    ensure_reachable_backend()
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sdr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdr_tpu import config as cfg
    from sdr_tpu.models import receiver as rx
    from sdr_tpu.ops import fir as jfir
    from sdr_tpu.ops import demod as jdemod
    from sdr_tpu.ops import pll as jpll
    from sdr_tpu.utils import synth

    mc = cfg.get_mode_config(args.mode)
    with_rds = mc.rds is not None
    bs = mc.default_block_size(with_rds=with_rds)
    res = synth.synthesize_fm(duration_s=0.1, mode=args.mode,
                              with_stereo=True, with_rds=with_rds, seed=0)
    blk_u8 = jnp.asarray(np.tile(res.iq_u8[:bs], (C, 1)))
    coeffs = rx.design_coeffs(mc)
    on_tpu = jax.default_backend() == "tpu"
    n_rf = bs // 2
    n_if = n_rf // mc.rf_decim

    def scan_diff(step, state0, data=()):
        """step: (carry, *data) -> (carry, scalar); scan-diff per-step ms.

        ``data`` holds the input arrays as EXPLICIT jit arguments — a
        closed-over device array is embedded into the serialized program,
        and the tunneled remote-compile endpoint rejects bodies past a
        few hundred MB (HTTP 413) at C=1024 f32 shapes."""
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

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    def measure(label, step, state0, data=()):
        """A stage that fails to compile records its error instead of
        killing the whole profile (e.g. the legacy VPU Pallas FIR OOMs
        Mosaic VMEM at mode-3 shapes — an honest per-variant datum)."""
        try:
            timings[label] = scan_diff(step, state0, data)
        except Exception as e:
            errors[label] = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"# stage {label} FAILED: {errors[label][:120]}",
                  file=sys.stderr)

    # --- full fused DAG (the bench's unit), both kernel stacks ------------
    def full_step_factory(**kw):
        def step(st, blk):
            out, st = rx.process_block(blk, coeffs, st, mc, stereo=True,
                                       with_rds=with_rds, **kw)
            probe = out.rds_symbols if with_rds else out.mono
            return st, jnp.sum(out.left) + jnp.sum(probe)
        return step

    st0 = rx.init_state(mc, batch_shape=(C,))
    measure("full_dag_mxu", 
        full_step_factory(mxu_fir=True, pallas_pll=on_tpu), st0, (blk_u8,))
    if on_tpu:
        # the shipped default: mxu FIRs + fused Pallas MXU u8 front-end
        # (fir_frontend_u8_pallas_int, r4 race winner) + Pallas PLL
        measure("full_dag_default_pallas_int", 
            full_step_factory(mxu_fir=True, pallas_frontend=True,
                              pallas_pll=True), st0, (blk_u8,))
        measure("full_dag_r2_pallas_conv", 
            full_step_factory(pallas_frontend=True, mxu_fir=False,
                              pallas_pll=True), st0, (blk_u8,))

    # --- stage inputs (device-resident, realistic magnitudes) -------------
    key = jax.random.PRNGKey(0)
    fm = jax.random.normal(key, (C, n_if), jnp.float32) * 0.3
    iq2 = jax.random.normal(key, (C, 2, n_rf), jnp.float32) * 0.3

    # 0. u8 normalize + deinterleave
    def u8_step(st, blk):
        x = (blk.astype(jnp.float32) - 128.0) * jnp.float32(1 / 128.0)
        return st + 1, jnp.sum(x[..., 0::2]) - jnp.sum(x[..., 1::2])
    measure("u8_norm_deinterleave", 
        u8_step, jnp.zeros((), jnp.int32), (blk_u8,))

    # 1. RF front-end variants (state-chained)
    def rf_step_mm(st2, x2):
        y, st2 = jfir.fir_block_decim_mm(x2, coeffs.rf, st2, mc.rf_decim)
        return st2, jnp.sum(y)
    rfst = jnp.zeros((C, 2, mc.rf_taps - 1), jnp.float32)
    measure("rf_fir_mm", rf_step_mm, rfst, (iq2,))

    def rf_step_xla(st2, x2):
        y, st2 = jfir.fir_block_decim(x2, coeffs.rf, st2, mc.rf_decim)
        return st2, jnp.sum(y)
    measure("rf_fir_xla_conv", rf_step_xla, rfst, (iq2,))

    # 1b. the fused u8 front-end: u8->bf16 normalize + deinterleave +
    # weight-split bf16 matmul as ONE unit (compare against
    # u8_norm_deinterleave + rf_fir_mm, the f32 pipeline it replaces)
    def rf_step_u8bf16(st2, blk):
        q2 = jnp.stack([blk[..., 0::2], blk[..., 1::2]], axis=-2)
        q2 = ((q2.astype(jnp.bfloat16) - jnp.bfloat16(128.0))
              * jnp.bfloat16(1.0 / 128.0))
        y, st2 = jfir.fir_block_decim_mm_bf16x(q2, coeffs.rf, st2,
                                               mc.rf_decim)
        return st2, jnp.sum(y)
    measure("rf_frontend_u8_bf16x", 
        rf_step_u8bf16, rfst.astype(jnp.bfloat16), (blk_u8,))

    if on_tpu:
        from sdr_tpu.ops import pallas_fir
        from sdr_tpu.ops import pallas_fir_mxu as pfm

        def rf_step_pal(st2, x2):
            y, st2 = pallas_fir.fir_block_decim_pallas(x2, coeffs.rf, st2,
                                                       mc.rf_decim)
            return st2, jnp.sum(y)
        measure("rf_fir_pallas", rf_step_pal, rfst, (iq2,))

        # the DEFAULT front-end: raw u8 in, fused normalize + window +
        # matmul in VMEM (replaces u8_norm_deinterleave + rf matmul)
        def rf_step_int(st2, blk):
            y, st2 = pfm.fir_frontend_u8_pallas_int(blk, coeffs.rf,
                                                    st2, mc.rf_decim)
            return st2, jnp.sum(y)
        measure("rf_frontend_u8_pallas_int", 
            rf_step_int, rfst, (blk_u8,))

    # 2. FM demod
    def demod_step(st, x):
        y, st = jdemod.fm_demod_quad(x, x * 0.5, st)
        return st, jnp.sum(y)
    measure("fm_demod", demod_step, jnp.zeros((C, 2)), (fm,))

    # 3. three-band BPF variants
    hs3 = (jnp.stack([coeffs.stereo, coeffs.pilot, coeffs.rds_channel])
           if with_rds else jnp.stack([coeffs.stereo, coeffs.pilot]))
    bst = jnp.zeros((C, hs3.shape[-1] - 1))

    def band_mm(st, x):
        y, st = jfir.fir_block_multi_mm(x, hs3, st)
        return st, jnp.sum(y)
    measure("bandpass_multi_mm", band_mm, bst, (fm,))

    def band_conv(st, x):
        y, st = jfir.fir_block_multi(x, hs3, st)
        return st, jnp.sum(y)
    measure("bandpass_multi_conv", band_conv, bst, (fm,))

    # 4. fused dual PLL variants
    pll_in = jnp.stack([fm * 0.1, fm * 0.1], axis=-2)
    pst = jax.tree.map(
        lambda l: jnp.broadcast_to(jnp.stack([l, l], axis=-1), (C, 2)),
        jpll.pll_init())
    params2 = (rx.pilot_pll_params(mc), rx.rds_pll_params(mc)) if with_rds \
        else (rx.pilot_pll_params(mc), rx.pilot_pll_params(mc))

    def pll_scan_step(st, x):
        nco, _, st = jpll.pll_block_fused(x, st, params2)
        return st, jnp.sum(nco)
    measure("pll_fused_scan", pll_scan_step, pst, (pll_in,))

    if on_tpu:
        from sdr_tpu.ops import pallas_pll as jppll

        def pll_pal_step(st, x):
            nco, _, st = jppll.pll_block_fused_pallas(x, st, params2)
            return st, jnp.sum(nco)
        measure("pll_fused_pallas", pll_pal_step, pst,
                                                (pll_in,))

    # 5. audio FIR pair
    pair = jnp.stack([fm, fm], axis=-2)
    ast_len = (jfir.resample_state_len(mc.audio_taps, mc.audio_upsamp)
               if mc.audio_upsamp > 1 else mc.audio_taps - 1)
    ast = jnp.zeros((C, 2, ast_len))
    for label, mxu in (("audio_fir_pair_mm", True),
                       ("audio_fir_pair_conv", False)):
        def audio_step(st, x, mxu=mxu):
            y, st = rx._audio_fir(x, coeffs.audio, st, mc, mxu)
            return st, jnp.sum(y)
        measure(label, audio_step, ast, (pair,))

    if with_rds:
        r = mc.rds
        rst = jnp.zeros((C, jfir.resample_state_len(r.resampler_taps,
                                                    r.upsamp)))
        for label, fn in (("rds_resampler_mm", jfir.fir_block_resample_mm),
                          ("rds_resampler_gather",
                           jfir.fir_block_resample)):
            def rs_step(st, x, fn=fn):
                y, st = fn(x, coeffs.rds_resampler, st, r.decim, r.upsamp)
                return st, jnp.sum(y)
            measure(label, rs_step, rst, (fm,))

        n_sym = n_if * r.upsamp // r.decim
        sym_in = jax.random.normal(key, (C, n_sym), jnp.float32)
        cst = jnp.zeros((C, r.rrc_taps - 1))

        def rrc_mm(st, x):
            y, st = jfir.fir_block_decim_mm(x, coeffs.rds_rrc, st, 1)
            return st, jnp.sum(y)
        measure("rds_rrc_mm", rrc_mm, cst, (sym_in,))

        def rrc_conv(st, x):
            y, st = jfir.fir_block(x, coeffs.rds_rrc, st)
            return st, jnp.sum(y)
        measure("rds_rrc_conv", rrc_conv, cst, (sym_in,))

    dev = jax.devices()[0]
    # default-kernel stage sum: on TPU the fused u8 front-end REPLACES
    # the normalize+deinterleave pass and the RF matmul
    chosen = (["rf_frontend_u8_pallas_int"] if on_tpu
              else ["u8_norm_deinterleave", "rf_fir_mm"])
    chosen += ["fm_demod", "bandpass_multi_mm",
               "pll_fused_pallas" if on_tpu else "pll_fused_scan",
               "audio_fir_pair_mm"]
    if with_rds:
        chosen += ["rds_resampler_mm", "rds_rrc_mm"]
    result = {
        "device": dev.device_kind, "platform": dev.platform,
        "mode": args.mode, "channels": C,
        "block_iq_pairs": n_rf, "if_samples": n_if,
        "methodology": (f"scan-difference: (t(scan {N2}) - t(scan {N1}))"
                        f" / {N2 - N1}, scalar-fetch sync, best of "
                        f"{REPS} — immune to tunnel dispatch latency"),
        "timings_ms": {k: round(v, 4) for k, v in timings.items()},
        "stage_sum_default_kernels_ms": round(
            sum(timings[k] for k in chosen if k in timings), 4),
        "note": ("stage_sum uses the DAG's default kernel choices; "
                 "full_dag < stage_sum = XLA fusion gain"),
    }
    if errors:
        result["stage_errors"] = errors
    print(json.dumps(result, indent=2))
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "profile_stages.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
