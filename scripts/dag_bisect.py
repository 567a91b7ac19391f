"""Cumulative sub-DAG attribution of the serving-regime block time.

scripts/profile_stages.py measures each stage ISOLATED; their
default-kernel sum undershoots the measured full DAG (1.06 vs 1.96 ms at
C=512 after the r4 front-end landed), so the difference — inter-stage
glue (stacks/relayouts between arms, mixer elementwise passes, state
(de)interleaving, per-scan-step overhead) plus fusion effects — needs its
own attribution.  This harness times a LADDER of truncated DAGs, each one
the previous plus one more stage of the real ``process_block`` code path,
under the same scan-difference methodology; consecutive differences
attribute the block time *in context* (with XLA fusing across stage
boundaries exactly as it does in production).

Usage: python scripts/dag_bisect.py [C] [--mode M]
Writes docs/dag_bisect.json.
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
    from sdr_tpu.ops import demod as jdemod
    from sdr_tpu.ops import fir as jfir
    from sdr_tpu.utils import synth

    mc = cfg.get_mode_config(args.mode)
    with_rds = mc.rds is not None
    bs = mc.default_block_size(with_rds=with_rds)
    res = synth.synthesize_fm(duration_s=0.1, mode=args.mode,
                              with_stereo=True, with_rds=with_rds, seed=0)
    blk_u8 = jnp.asarray(np.tile(res.iq_u8[:bs], (C, 1)))
    coeffs = rx.design_coeffs(mc)
    sel = rx.auto_kernel_selectors()
    on_tpu = jax.default_backend() == "tpu"

    def scan_diff(step, state0):
        # blk_u8 rides as an explicit jit argument: closed-over device
        # arrays are embedded into the serialized program, and the
        # tunneled remote-compile endpoint caps request bodies (HTTP 413)
        times = {}
        for n in (N1, N2):
            @jax.jit
            def scan_fn(st, blk):
                def body(c, _):
                    c, s = step(c, blk)
                    return c, s
                c, sums = lax.scan(body, st, None, length=n)
                return jnp.sum(sums)
            s = float(scan_fn(state0, blk_u8))
            assert np.isfinite(s), s
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(scan_fn(state0, blk_u8))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return max(times[N2] - times[N1], 0.0) / (N2 - N1) * 1e3

    # the ladder reuses process_block itself with arms switched off where
    # the flag space allows, and hand-truncated prefixes elsewhere, so
    # every rung IS production code in context
    from sdr_tpu.ops import pallas_fir_mxu as pfm

    def _frontend(st, blk):
        """The production front-end stage on the selected kernel."""
        st2 = jnp.stack([st.rf_i, st.rf_q], axis=-2)
        if sel["pallas_frontend"]:
            ds2, nst2 = pfm.fir_frontend_u8_pallas_int(blk, coeffs.rf,
                                                       st2, mc.rf_decim)
        else:
            x = ((blk.astype(jnp.float32) - 128.0)
                 * jnp.float32(1.0 / 128.0))
            x2 = jnp.moveaxis(
                x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2)), -1, -2)
            ds2, nst2 = jfir.fir_block_decim_mm(x2, coeffs.rf, st2,
                                                mc.rf_decim)
        st = st._replace(rf_i=nst2[..., 0, :], rf_q=nst2[..., 1, :])
        return st, ds2

    def fe_only(st, blk):
        """Rung 1: u8 front-end alone (the kernel + state round-trip)."""
        st, ds2 = _frontend(st, blk)
        return st, jnp.sum(ds2)

    def fe_demod(st, blk):
        """Rung 2: + FM discriminator (one front-end pass, shared)."""
        st, ds2 = _frontend(st, blk)
        fm, d_iq = jdemod.fm_demod_quad(ds2[..., 0, :], ds2[..., 1, :],
                                        st.demod_iq)
        st = st._replace(demod_iq=d_iq)
        return st, jnp.sum(fm)

    def make_pb(stereo, with_rds_, **over):
        kw = dict(sel)
        kw.update(over)

        def step(st, blk):
            out, st = rx.process_block(blk, coeffs, st, mc,
                                       stereo=stereo, with_rds=with_rds_,
                                       **kw)
            s = jnp.sum(out.mono)
            if stereo:
                s = s + jnp.sum(out.left)
            if with_rds_:
                s = s + jnp.sum(out.rds_symbols)
            return st, s
        return step

    # --- fine rungs inside the stereo arm: replicate process_block's
    # stereo fragments so consecutive deltas attribute the arm's glue
    # (PLL input stack / NCO materialization / mixer+audio relayouts)
    from sdr_tpu.ops import pll as jpll
    if sel["pallas_pll"]:
        from sdr_tpu.ops import pallas_pll as jppll
        pll_single = jppll.pll_block_pallas
    else:
        pll_single = jpll.pll_block

    def demod_allpass(st, blk):
        st, ds2 = _frontend(st, blk)
        fm, d_iq = jdemod.fm_demod_quad(ds2[..., 0, :], ds2[..., 1, :],
                                        st.demod_iq)
        fm_delayed, ap = jfir.allpass_delay(fm, st.mono_allpass)
        st = st._replace(demod_iq=d_iq, mono_allpass=ap)
        return st, fm, fm_delayed

    def bands(st, blk):
        st, fm, fm_delayed = demod_allpass(st, blk)
        hs = jnp.stack([coeffs.stereo, coeffs.pilot])
        filt2, tail = jfir.fir_block_multi_mm(fm, hs, st.stereo_bpf)
        st = st._replace(stereo_bpf=tail, pilot_bpf=tail)
        return st, fm_delayed, filt2[..., 0, :], filt2[..., 1, :]

    def rung_bands(st, blk):
        st, fmd, st_filt, pi_filt = bands(st, blk)
        return st, jnp.sum(st_filt) + jnp.sum(pi_filt) + jnp.sum(fmd)

    def rung_pll(st, blk):
        st, fmd, st_filt, pi_filt = bands(st, blk)
        nco, _, pst = pll_single(pi_filt, st.pilot_pll,
                                 rx.pilot_pll_params(mc))
        st = st._replace(pilot_pll=pst)
        return st, jnp.sum(nco) + jnp.sum(st_filt) + jnp.sum(fmd)

    def rung_pll_mix(st, blk):
        """Rung 4c (r5): the mixer-fused PLL kernel in context — the
        production stereo path up to the finished mixer product (what
        4b's angle-only kernel + XLA glue used to cost)."""
        st, fmd, st_filt, pi_filt = bands(st, blk)
        if sel["pallas_pll"]:
            from sdr_tpu.ops import pallas_pll as jppll
            mixers, pst = jppll.pll_mixer_fused_pallas(
                pi_filt[..., None, :], st_filt[..., None, :],
                jax.tree.map(lambda l: l[..., None], st.pilot_pll),
                (rx.pilot_pll_params(mc),))
            mixer = mixers[..., 0, :]
            st = st._replace(pilot_pll=jax.tree.map(lambda l: l[..., 0],
                                                    pst))
        else:
            nco, _, pst = pll_single(pi_filt, st.pilot_pll,
                                     rx.pilot_pll_params(mc))
            mixer = nco[..., :-1] * st_filt * 2.0
            st = st._replace(pilot_pll=pst)
        return st, jnp.sum(mixer) + jnp.sum(fmd)

    st0 = rx.init_state(mc, batch_shape=(C,))
    rungs = [
        ("1_frontend", fe_only),
        ("2_plus_demod", fe_demod),
        ("3_mono_only_dag", make_pb(False, False)),
        ("4a_plus_bands", rung_bands),
        ("4b_plus_pilot_pll", rung_pll),
        ("4c_plus_fused_pll_mixer", rung_pll_mix),
        ("4_stereo_dag", make_pb(True, False)),
    ]
    if with_rds:
        rungs.append(("5_stereo_rds_dag", make_pb(True, True)))

    timings = {}
    prev = 0.0
    deltas = {}
    for name, step in rungs:
        t = scan_diff(step, st0)
        timings[name] = round(t, 4)
        deltas[name] = round(t - prev, 4)
        prev = t
        print(f"# {name:18s}: {t:8.4f} ms (delta {deltas[name]:+8.4f})",
              file=sys.stderr)

    dev = jax.devices()[0]
    result = {
        "device": dev.device_kind, "platform": dev.platform,
        "mode": args.mode, "channels": C,
        "kernel_selectors": sel,
        "methodology": (f"scan-difference ladder: cumulative sub-DAGs, "
                        f"(t(scan {N2}) - t(scan {N1})) / {N2 - N1}, "
                        f"best of {REPS}; consecutive deltas attribute "
                        "block time IN CONTEXT (fusion included); note "
                        "4a/4b extend rung 2+allpass (no mono audio FIR, "
                        "which rung 3 shows ~free), so 3->4a mixes a tiny "
                        "removal with the band add"),
        "cumulative_ms": timings,
        "delta_ms": deltas,
    }
    print(json.dumps(result, indent=2))
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "dag_bisect.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
