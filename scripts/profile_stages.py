"""Per-stage device-time attribution for the channel-batched serving regime.

VERDICT r2 #1: the aggregate sweep plateaus at ~1.29 GS/s from C=128 up
(per-channel cost constant), 64x below DESIGN.md's claimed input roofline.
This script times every stage of the mode-0 stereo+RDS DAG as its OWN
jitted function at a given channel count, plus the full fused DAG, and
emits docs/profile_stages.json — the attribution VERDICT asked for.

Stage timing methodology: each stage runs standalone under jit with
donated/realistic inputs, best-of-R repeats of K dispatches (the tunneled
chip's dispatch latency is bimodal session-to-session — CLAUDE.md).  The
stage sum exceeding the fused-DAG time measures XLA's fusion gain; a stage
dominating the sum is the plateau's cause.

Usage: python scripts/profile_stages.py [C] [--mode M]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(fn, *args, repeats=3, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("channels", nargs="?", type=int, default=512)
    ap.add_argument("--mode", type=int, default=0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    C = args.channels

    from sdr_tpu.utils.device import ensure_reachable_backend
    ensure_reachable_backend()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sdr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sdr_tpu import config as cfg
    from sdr_tpu.models import receiver as rx
    from sdr_tpu.ops import fir as jfir
    from sdr_tpu.ops import demod as jdemod
    from sdr_tpu.ops import pll as jpll
    from sdr_tpu.ops import pallas_fir
    from sdr_tpu.utils import synth

    mc = cfg.get_mode_config(args.mode)
    with_rds = mc.rds is not None
    bs = mc.default_block_size(with_rds=with_rds)
    res = synth.synthesize_fm(duration_s=0.1, mode=args.mode,
                              with_stereo=True, with_rds=with_rds, seed=0)
    iq_u8 = np.tile(res.iq_u8[:bs], (C, 1))
    blk_u8 = jnp.asarray(iq_u8)
    coeffs = rx.design_coeffs(mc)
    on_tpu = jax.default_backend() == "tpu"

    n_rf = bs // 2
    n_if = n_rf // mc.rf_decim
    timings: dict[str, float] = {}
    B = best_of
    bo = functools.partial(B, iters=args.iters)

    # --- full fused DAG (the bench's measured unit) -----------------------
    fn = rx.make_block_fn(mc, stereo=True, with_rds=with_rds)
    st0 = rx.init_state(mc, batch_shape=(C,))

    def full_step(blk, st):
        out, st = fn(blk, coeffs, st)
        return out.left, st
    # state-chained like the bench
    out = fn(blk_u8, coeffs, st0)
    jax.block_until_ready(out)
    st = out[1]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o, st = fn(blk_u8, coeffs, st)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / args.iters)
    timings["full_dag"] = best * 1e3

    # --- stage inputs (realistic shapes, f32, device-resident) ------------
    key = jax.random.PRNGKey(0)
    fm = jax.random.normal(key, (C, n_if), jnp.float32) * 0.3
    i_raw = jax.random.normal(key, (C, n_rf), jnp.float32) * 0.3
    q_raw = jax.random.normal(key, (C, n_rf), jnp.float32) * 0.3
    iq2 = jnp.stack([i_raw, q_raw], axis=-2)
    rfst2 = jnp.zeros((C, 2, mc.rf_taps - 1), jnp.float32)

    # 0. u8 normalize + deinterleave
    @jax.jit
    def norm_deint(u8):
        x = (u8.astype(jnp.float32) - 128.0) * jnp.float32(1 / 128.0)
        return x[..., 0::2], x[..., 1::2]
    timings["u8_norm_deinterleave"] = bo(norm_deint, blk_u8)

    # 1. RF front-end: Pallas fused I/Q decimating FIR
    @jax.jit
    def rf_pallas(x2, st2):
        return pallas_fir.fir_block_decim_pallas(x2, coeffs.rf, st2,
                                                 mc.rf_decim)
    if on_tpu:
        timings["rf_fir_pallas"] = bo(rf_pallas, iq2, rfst2)

    # 1b. RF front-end: XLA conv path
    @jax.jit
    def rf_xla(x2, st2):
        return jfir.fir_block_decim(x2, coeffs.rf, st2, mc.rf_decim)
    timings["rf_fir_xla"] = bo(rf_xla, iq2, rfst2)

    # 2. FM demod
    i_ds = fm
    q_ds = fm * 0.5

    @jax.jit
    def demod(i, q):
        return jdemod.fm_demod_quad(i, q, jnp.zeros((C, 2)))
    timings["fm_demod"] = bo(demod, i_ds, q_ds)

    # 3. three-band BPF (fir_block_multi)
    hs3 = jnp.stack([coeffs.stereo, coeffs.pilot, coeffs.rds_channel]) \
        if with_rds else jnp.stack([coeffs.stereo, coeffs.pilot])

    @jax.jit
    def band3(x):
        return jfir.fir_block_multi(x, hs3, jnp.zeros((C, hs3.shape[-1] - 1)))
    timings["bandpass_multi"] = bo(band3, fm)

    # 4. fused dual PLL: scan vs pallas
    pil = fm * 0.1
    car = fm * 0.1
    pll_in = jnp.stack([pil, car], axis=-2)
    pst = jpll.pll_init()
    pst2 = jax.tree.map(
        lambda l: jnp.broadcast_to(jnp.stack([l, l], axis=-1), (C, 2)), pst)
    params2 = (rx.pilot_pll_params(mc), rx.rds_pll_params(mc)) if with_rds \
        else (rx.pilot_pll_params(mc),)
    if not with_rds:
        pll_in = pil[:, None, :]
        pst2 = jax.tree.map(lambda l: l[..., :1], pst2)

    @jax.jit
    def pll_scan(x, st):
        return jpll.pll_block_fused(x, st, params2)
    timings["pll_fused_scan"] = bo(pll_scan, pll_in, pst2)

    if on_tpu:
        from sdr_tpu.ops import pallas_pll as jppll

        @jax.jit
        def pll_pal(x, st):
            return jppll.pll_block_fused_pallas(x, st, params2)
        timings["pll_fused_pallas"] = bo(pll_pal, pll_in, pst2)

    # 5. audio FIR pair (mono+stereo batched)
    pair = jnp.stack([fm, fm], axis=-2)
    ast_len = (jfir.resample_state_len(mc.audio_taps, mc.audio_upsamp)
               if mc.audio_upsamp > 1 else mc.audio_taps - 1)
    ast = jnp.zeros((C, 2, ast_len))

    @jax.jit
    def audio2(x, st):
        if mc.audio_upsamp > 1:
            return jfir.fir_block_resample(x, coeffs.audio, st,
                                           mc.audio_decim, mc.audio_upsamp)
        return jfir.fir_block_decim(x, coeffs.audio, st, mc.audio_decim)
    timings["audio_fir_pair"] = bo(audio2, pair, ast)

    if with_rds:
        r = mc.rds
        rst = jnp.zeros((C, jfir.resample_state_len(r.resampler_taps,
                                                    r.upsamp)))

        # 6. RDS rational resampler (gather-einsum path)
        @jax.jit
        def rds_resamp(x, st):
            return jfir.fir_block_resample(x, coeffs.rds_resampler, st,
                                           r.decim, r.upsamp)
        timings["rds_resampler"] = bo(rds_resamp, fm, rst)

        # 7. RDS RRC
        n_sym = n_if * r.upsamp // r.decim
        sym_in = jax.random.normal(key, (C, n_sym), jnp.float32)

        @jax.jit
        def rrc(x):
            return jfir.fir_block(x, coeffs.rds_rrc,
                                  jnp.zeros((C, r.rrc_taps - 1)))
        timings["rds_rrc"] = bo(rrc, sym_in)

    dev = jax.devices()[0]
    stage_keys = [k for k in timings if k != "full_dag"
                  and k not in ("rf_fir_xla", "pll_fused_scan")]
    if not on_tpu:
        stage_keys = [k for k in timings if k != "full_dag"
                      and k != "rf_fir_xla"]
    result = {
        "device": dev.device_kind, "platform": dev.platform,
        "mode": args.mode, "channels": C,
        "block_iq_pairs": n_rf, "if_samples": n_if,
        "timings_ms": {k: round(v, 4) for k, v in timings.items()},
        "stage_sum_ms": round(sum(timings[k] for k in stage_keys), 4),
        "note": ("stage_sum uses the DAG's actual kernel choices (pallas "
                 "on TPU); full_dag < stage_sum = XLA fusion gain, "
                 "full_dag > stage_sum = overhead unattributed"),
    }
    print(json.dumps(result, indent=2))
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "profile_stages.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
