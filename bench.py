"""Headline benchmark: full stereo+RDS receiver throughput on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric definition: the BEST sustained raw-IQ throughput (Msamples/s of IQ
pairs) through the complete mode-0 receiver DAG — RF front-end, mono,
stereo (pilot PLL), RDS to soft symbols — across the operating regimes:
single-stream (the reference's mode) and a channel-parallel batch of
independent stations SWEPT over batch sizes (this framework's
data-parallel serving axis, SURVEY.md §2.3; per-row outputs bit-identical
to single-channel runs, tests/test_models_receiver.py::TestChannelBatch).

Timing methodology (round 3 — replaces rounds 1-2): **scan-difference
device time**.  The dev chip is reached through a tunnel whose
per-dispatch latency is large, variable session-to-session, AND whose
``block_until_ready`` does not reliably wait (measured: the same chained
per-block loop reads 24 ms/block in one session and 0.14 ms/block in
another for the identical compiled program).  Host-side per-dispatch
timing therefore measures the tunnel, not the chip.  Instead each regime
is timed as two jitted ``lax.scan`` programs over N1 and N2 blocks whose
final value is a SCALAR (fetched, forcing true completion);

    per_block = (t(scan N2) - t(scan N1)) / (N2 - N1)

cancels every constant term (dispatch, fetch round-trip, scan overhead)
and leaves pure on-device per-block time.  The serving regime really is
a scan (run_blocks_scan / Receiver.iter_run), so this is also the shape
production dispatches take.  Per-dispatch latency is still REPORTED
(BENCH_DETAIL "dispatch_latency_ms") — it is the interactive-use floor —
but the throughput headline no longer conflates it with compute.

Also measured (BENCH_DETAIL.json): per-mode single-stream AND
channel-batched throughput for ALL four operating modes — the rational-
resampler modes 1-3 were the reference's worst case (BASELINE.md Table 3:
429 ms mode-3 resampler) and round 2's open gap (VERDICT r2 #2).

Baseline: the reference runs ONE station in real time at its input rate,
2.4 MS/s, on a Raspberry Pi 4 (BASELINE.md: mono+stereo only; RDS never
ran real-time at all).  vs_baseline = throughput / 2.4 MS/s.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MSPS = 2.4  # reference real-time input rate on RPi 4
N1 = int(os.environ.get("SDR_BENCH_N1", "4"))
N2 = int(os.environ.get("SDR_BENCH_N2", "16"))
REPS = int(os.environ.get("SDR_BENCH_REPS", "3"))


def _make_scan(rx, mc, coeffs, iq_u8, bs, nb, c, stereo=True,
               with_rds=True):
    """Jitted scan over nb blocks ending in one scalar (true-sync fetch)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def scan_fn(blocks, state):
        def step(st, blk):
            # channel_chunk=512: batches past the measured per-channel
            # sweet spot run as sequential 512-channel programs (falls
            # through to the direct call at C<=512) — the production
            # serving configuration for large C
            out, st = rx.process_block_channel_chunked(
                blk, coeffs, st, mc, stereo=stereo, with_rds=with_rds,
                channel_chunk=512, **rx.auto_kernel_selectors())
            probe = out.rds_symbols if with_rds else out.mono
            return st, jnp.sum(out.left) + jnp.sum(probe)
        st, sums = lax.scan(step, state, blocks)
        return jnp.sum(sums)

    src = np.stack([iq_u8[(b % 4) * bs:((b % 4) + 1) * bs]
                    for b in range(nb)])
    if c == 1:
        blocks = jnp.asarray(src)
    else:
        blocks = jnp.asarray(
            np.broadcast_to(src[:, None, :], (nb, c, bs)).copy())
    return scan_fn, blocks


def _sync_time(scan_fn, blocks, state, reps=REPS):
    """Best-of synchronous wall time of one scan dispatch (scalar fetch)."""
    s = float(scan_fn(blocks, state))       # compile + warm
    assert np.isfinite(s), s
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(scan_fn(blocks, state))
        best = min(best, time.perf_counter() - t0)
    return best


def _scan_diff_ms_per_block(rx, mc, coeffs, iq_u8, bs, c, stereo=True,
                            with_rds=True):
    """Scan-difference per-block device time, gated for plausibility.

    The tunnel's bimodality can flap BETWEEN the N1 and N2 measurements,
    making t2 - t1 ~ 0 (or negative) and the implied throughput absurd
    (observed: a 14.7e9 MS/s 'headline').  Gate the difference against a
    physical floor — the DAG must at least READ the input block from HBM
    (c*bs bytes at a generous 2 TB/s) — and remeasure both scans when it
    fails; after MAX_TRIES, return NaN so the caller can skip the row
    rather than record garbage.
    """
    import jax  # noqa: F401  (backend must be up)
    state = (rx.init_state(mc) if c == 1
             else rx.init_state(mc, batch_shape=(c,)))
    f1, b1 = _make_scan(rx, mc, coeffs, iq_u8, bs, N1, c, stereo, with_rds)
    f2, b2 = _make_scan(rx, mc, coeffs, iq_u8, bs, N2, c, stereo, with_rds)
    floor_ms = c * bs / 2e12 * 1e3          # input bytes / 2 TB/s
    for attempt in range(4):
        t1 = _sync_time(f1, b1, state)
        t2 = _sync_time(f2, b2, state)
        ms = (t2 - t1) / (N2 - N1) * 1e3
        if ms >= floor_ms:
            del b1, b2
            return ms
        print(f"# implausible scan-diff at C={c} ({ms:.5f} ms < floor "
              f"{floor_ms:.5f}; tunnel flapped mid-measure), retrying",
              file=sys.stderr)
    del b1, b2
    return float("nan")


def main() -> None:
    import jax

    from sdr_tpu.utils.device import accelerator_healthy

    # the dev chip's tunnel sometimes hangs indefinitely, which would leave
    # the driver with no benchmark result at all — fall back to CPU then.
    # The tunnel flaps on a scale of MINUTES (CLAUDE.md), so the retry
    # window must span minutes: 6 attempts with 45 s backoff ≈ up to
    # ~4 min of waiting (plus per-attempt probe time) before surrendering
    # the number of record to a CPU run.  SDR_TPU_NO_PROBE skips the probe
    # AND the fallback (TPU-or-hang, for queued runs wrapped in a hard
    # timeout that retry instead).
    if not os.environ.get("SDR_TPU_NO_PROBE") \
            and not accelerator_healthy(attempts=6, backoff_s=45.0):
        # must happen before the backend initializes in THIS process
        jax.config.update("jax_platforms", "cpu")
        print("# accelerator unreachable; benchmarking on CPU fallback",
              file=sys.stderr)

    # persistent compile cache: repeat bench runs skip XLA compilation
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/sdr_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from sdr_tpu import config as cfg
    from sdr_tpu.models import receiver as rx
    from sdr_tpu.utils import synth

    on_accel = jax.devices()[0].platform != "cpu"
    sweep = os.environ.get(
        "SDR_BENCH_SWEEP", "32,128,256,512,1024" if on_accel else "4,8")
    channel_sweep = [int(c) for c in sweep.split(",") if c]
    modes = [0, 1, 2, 3] if on_accel else [0]
    detail = {"device": jax.devices()[0].device_kind,
              "platform": jax.devices()[0].platform,
              "baseline_msps": BASELINE_MSPS,
              "methodology": (
                  "scan-difference device time: per_block = "
                  f"(t(scan {N2}) - t(scan {N1})) / {N2 - N1}, each scan "
                  "one jitted dispatch ending in a fetched scalar "
                  "(true sync); best of "
                  f"{REPS}; cancels tunnel dispatch/fetch constants; "
                  "C>512 runs channel-chunked (sequential 512-channel "
                  "programs, receiver.process_block_channel_chunked)"),
              "aggregate_sweep": [], "modes": {}}
    t_wall = time.time()

    mc = cfg.get_mode_config(0)
    bs = mc.default_block_size(with_rds=True)
    res = synth.synthesize_fm(duration_s=0.25, mode=0, with_stereo=True,
                              with_rds=True, seed=0)
    iq = res.iq_u8
    coeffs = rx.design_coeffs(mc)

    # --- single-stream device time (the reference's operating regime) ----
    ms1 = _scan_diff_ms_per_block(rx, mc, coeffs, iq, bs, 1)
    single_msps = (bs / 2) / ms1 / 1e3 if np.isfinite(ms1) else 0.0
    detail["single_stream_msps"] = round(single_msps, 1)
    detail["single_stream_ms_per_block_device"] = (round(ms1, 4)
                                                  if np.isfinite(ms1)
                                                  else None)
    detail["block_iq_pairs"] = bs // 2
    print(f"# single-stream: {single_msps:8.1f} MS/s "
          f"({ms1:.4f} ms/blk device)", file=sys.stderr)

    # --- per-dispatch latency (tunnel-dependent; interactive floor) ------
    fn = rx.make_block_fn(mc, stereo=True, with_rds=True)
    st = rx.init_state(mc)
    import jax.numpy as jnp
    blk = jnp.asarray(iq[:bs])
    out, st = fn(blk, coeffs, st)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n_lat = 20
    for _ in range(n_lat):
        out, st = fn(blk, coeffs, st)
        float(jnp.sum(out.left))        # forced round-trip per block
    detail["dispatch_latency_ms"] = round(
        (time.perf_counter() - t0) / n_lat * 1e3, 3)
    print(f"# dispatch latency: {detail['dispatch_latency_ms']:.3f} "
          "ms/blk (tunnel-dependent)", file=sys.stderr)

    # --- channel-parallel aggregate sweep ---------------------------------
    agg_best, agg_best_c = 0.0, 0
    for c in channel_sweep:
        try:
            msc = _scan_diff_ms_per_block(rx, mc, coeffs, iq, bs, c)
        except Exception as e:
            # only resource exhaustion marks the knee; anything else is a
            # real bug and must fail the bench loudly (ADVICE r2)
            msg = f"{type(e).__name__}: {e}"
            if ("RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
                    or "out of memory" in msg):
                print(f"# C={c}: OOM, sweep stops ({msg[:120]})",
                      file=sys.stderr)
                break
            raise
        if not np.isfinite(msc):
            print(f"# C={c}: no plausible measurement (tunnel flapping); "
                  "row skipped", file=sys.stderr)
            continue
        msps = c * (bs / 2) / msc / 1e3
        detail["aggregate_sweep"].append(
            {"channels": c, "msps": round(msps, 1),
             "ms_per_block": round(msc, 4)})
        print(f"# C={c:5d}: {msps:10.0f} MS/s ({msc:8.4f} ms/blk device)",
              file=sys.stderr)
        if msps > agg_best:
            agg_best, agg_best_c = msps, c

    # --- per-mode: single-stream AND C=128 aggregate (VERDICT r2 #2) -----
    c_mode = 128 if on_accel else 4
    for m in modes:
        mcm = cfg.get_mode_config(m)
        rds_m = mcm.rds is not None
        bsm = mcm.default_block_size(with_rds=rds_m)
        resm = synth.synthesize_fm(duration_s=0.12, mode=m,
                                   with_stereo=True, with_rds=rds_m,
                                   seed=0)
        iqm = resm.iq_u8
        if len(iqm) < 4 * bsm:
            iqm = np.tile(iqm, -(-4 * bsm // len(iqm)))
        cfm = rx.design_coeffs(mcm)
        if m == 0:
            ms_m1, agg_c = ms1, next(
                (r for r in detail["aggregate_sweep"]
                 if r["channels"] == c_mode), None)
            ms_mc = (c_mode * (bsm / 2) / agg_c["msps"] / 1e3
                     if agg_c else None)
        else:
            ms_m1 = _scan_diff_ms_per_block(rx, mcm, cfm, iqm, bsm, 1,
                                            with_rds=rds_m)
            ms_mc = _scan_diff_ms_per_block(rx, mcm, cfm, iqm, bsm,
                                            c_mode, with_rds=rds_m)
        ok1 = ms_m1 is not None and np.isfinite(ms_m1)
        entry = {
            "single_msps": (round((bsm / 2) / ms_m1 / 1e3, 1)
                            if ok1 else None),
            "single_ms_per_block_device": (round(ms_m1, 4)
                                           if ok1 else None),
            "block_iq_pairs": bsm // 2,
        }
        if ms_mc is not None and np.isfinite(ms_mc):
            entry["aggregate_channels"] = c_mode
            entry["aggregate_msps"] = round(
                c_mode * (bsm / 2) / ms_mc / 1e3, 1)
        detail["modes"][str(m)] = entry
        print(f"# mode {m}: {entry['single_msps'] or float('nan'):8.1f} "
              "MS/s single | "
              f"{entry.get('aggregate_msps') or float('nan'):10.1f} MS/s "
              f"at C={c_mode}", file=sys.stderr)

    total_s = time.time() - t_wall
    headline = max(agg_best, single_msps)
    detail["headline_msps"] = round(headline, 1)
    detail["headline_channels"] = agg_best_c if agg_best > single_msps else 1
    detail["bench_wall_s"] = round(total_s, 1)
    # A CPU-fallback run must never clobber the TPU measurement of record
    # (VERDICT r4 #1): the fallback writes its own artifact file.
    platform = jax.devices()[0].platform
    detail_name = ("BENCH_DETAIL.json" if platform != "cpu"
                   else "BENCH_DETAIL_cpu.json")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           detail_name), "w") as f:
        json.dump(detail, f, indent=2)

    # platform/device ride in the one-line record so a CPU fallback can
    # never masquerade as a TPU number (VERDICT r4 #1)
    print(json.dumps({
        "metric": "stereo_rds_sustained_iq_throughput",
        "value": round(headline, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(headline / BASELINE_MSPS, 1),
        "platform": platform,
        "device": jax.devices()[0].device_kind,
    }))
    print(f"# device={jax.devices()[0].device_kind} block={bs} | "
          f"best aggregate {agg_best:.0f} MS/s at C={agg_best_c} | "
          f"single-stream {single_msps:.0f} MS/s | "
          f"bench_wall={total_s:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
