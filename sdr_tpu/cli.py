"""Command-line receiver: u8 IQ in -> PCM/wav/RDS out.

Replaces the reference's positional-argv entry points
(``./project <mode 0-3> <channels 1|2>``, src/project.cpp:385-419;
``python3 stereo.py <mode>``) with one typed CLI over the TPU receiver:

    python -m sdr_tpu.cli --mode 0 --stereo capture.raw -o out.pcm
    rtl_sdr -f 99.9M -s 2.4M - | python -m sdr_tpu.cli --mode 0 - | aplay ...

Streaming uses the jitted per-block step with carried state (the same
program bench.py measures); ``--wav`` writes a .wav instead of raw PCM and
``--rds`` prints decoded RDS frame info to stderr.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from sdr_tpu import config as cfg
from sdr_tpu import io as sio


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sdr_tpu", description="TPU-native FM receiver")
    p.add_argument("input", help="raw interleaved u8 IQ file, or '-' "
                                 "for stdin")
    p.add_argument("--mode", type=int, default=0, choices=[0, 1, 2, 3],
                   help="sample-rate mode (group-28 constraint table)")
    p.add_argument("--stereo", action="store_true",
                   help="decode stereo (default mono)")
    p.add_argument("--rds", action="store_true",
                   help="decode RDS frames (modes 0/2 only)")
    p.add_argument("--rds-algo", default="robust",
                   choices=["robust", "reference"],
                   help="RDS symbol-clock recovery: restart-free "
                        "phase/parity estimation (robust, default) or the "
                        "reference-faithful CDR (reference)")
    p.add_argument("-o", "--output", default="-",
                   help="PCM output path, '-' for stdout")
    p.add_argument("--wav", action="store_true",
                   help="write a .wav file instead of raw PCM")
    p.add_argument("--block-size", type=int, default=None,
                   help="raw u8 samples per block (default per-mode)")
    p.add_argument("--stats", action="store_true",
                   help="print throughput stats to stderr at EOF")
    p.add_argument("--pallas", action="store_true",
                   help="run the RF front-end as the fused Pallas kernel")
    p.add_argument("--save-state", metavar="PATH",
                   help="checkpoint receiver state to PATH (.npz) at EOF")
    p.add_argument("--resume", metavar="PATH",
                   help="resume from a state checkpoint (.npz)")
    p.add_argument("--wideband", metavar="FS",
                   help="input is a wideband capture at FS samples/s: "
                        "channelize --offsets stations and decode them as "
                        "one batch (requires --wav -o PREFIX)")
    p.add_argument("--offsets", metavar="HZ,HZ,...",
                   help="comma-separated station offsets for --wideband")
    return p


def _main_wideband(args) -> int:
    """Wideband serving path: channelize + batched receive, one wav per
    station (out path PREFIX_<k>.wav), RDS per station on stderr."""
    from sdr_tpu.models import rds_decode, rds_groups
    from sdr_tpu.models import receiver as rx
    from sdr_tpu.models.channelizer import Channelizer

    if not args.offsets or not args.wav or args.output == "-":
        print("--wideband needs --offsets HZ,HZ,... and --wav -o PREFIX",
              file=sys.stderr)
        return 2
    for flag in ("save_state", "resume", "pallas"):
        if getattr(args, flag):
            print(f"--{flag.replace('_', '-')} is not supported with "
                  "--wideband; ignoring", file=sys.stderr)
    offsets = [float(f) for f in args.offsets.split(",")]
    mc = cfg.get_mode_config(args.mode)
    with_rds = args.rds and mc.rds is not None
    if args.rds and mc.rds is None:
        print(f"mode {args.mode} carries no RDS; ignoring --rds",
              file=sys.stderr)
    ch = Channelizer(offsets, float(args.wideband), args.mode)
    receiver = rx.Receiver(args.mode, stereo=args.stereo, with_rds=with_rds,
                           batch_shape=(len(offsets),))
    bs_wide = (args.block_size
               or mc.default_block_size(with_rds)) * ch.decim

    in_stream = sio.stdin_binary() if args.input == "-" else open(
        args.input, "rb")
    lefts, rights, monos, syms = [], [], [], []
    n_blocks = 0
    t0 = time.time()
    try:
        while True:
            raw = in_stream.read(bs_wide)
            if raw is None or len(raw) < bs_wide:
                break
            out = receiver.process(
                ch.process(np.frombuffer(raw, dtype=np.uint8)))
            if args.stereo:
                lefts.append(np.asarray(out.left))
                rights.append(np.asarray(out.right))
            else:
                monos.append(np.asarray(out.mono))
            if with_rds:
                syms.append(np.asarray(out.rds_symbols))
            n_blocks += 1
    finally:
        if in_stream is not sys.stdin.buffer:
            in_stream.close()
    dt = time.time() - t0

    if n_blocks == 0:
        print(f"input shorter than one wideband block ({bs_wide} samples); "
              "nothing decoded", file=sys.stderr)
        return 1
    left = np.concatenate(lefts, -1) if lefts else None
    right = np.concatenate(rights, -1) if rights else None
    mono = np.concatenate(monos, -1) if monos else None
    sym = np.concatenate(syms, -1) if syms else None
    for k, f_off in enumerate(offsets):
        path = f"{args.output}_{k}.wav"
        if args.stereo:
            audio = np.stack([left[k], right[k]], axis=-1)
        else:
            audio = mono[k]
        sio.write_wav(path, audio, mc.audio_fs)
        msg = f"station {k} @ {f_off / 1e6:+.2f} MHz -> {path}"
        if sym is not None:
            dec = rds_decode.decode_robust(sym[k], mc.rds.sps)
            msg += f" | RDS {len(dec.frames.matches)} frames"
            st = rds_groups.decode_station_from(dec)
            if st.n_groups and st.pi is not None:
                msg += f" PI={st.pi:04X} PS={st.ps_name!r}"
        print(msg, file=sys.stderr)
    if args.stats:
        pairs = n_blocks * bs_wide / 2
        print(f"{n_blocks} wideband blocks, {len(offsets)} stations, "
              f"{pairs / 1e6:.2f} M IQ pairs in {dt:.2f}s = "
              f"{pairs / dt / 1e6:.1f} MS/s", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from sdr_tpu.utils.device import ensure_reachable_backend
    ensure_reachable_backend()
    import jax

    from sdr_tpu.models import receiver as rx
    from sdr_tpu.models import rds_decode, rds_groups

    if args.wideband:
        return _main_wideband(args)

    mc = cfg.get_mode_config(args.mode)
    if args.wav and args.output == "-":
        print("--wav needs an output file: pass -o PATH", file=sys.stderr)
        return 2
    with_rds = args.rds and mc.rds is not None
    if args.rds and mc.rds is None:
        print(f"mode {args.mode} carries no RDS; ignoring --rds",
              file=sys.stderr)
    bs = args.block_size or mc.default_block_size(with_rds)

    receiver = rx.Receiver(args.mode, stereo=args.stereo, with_rds=with_rds)
    if args.pallas:
        receiver._fn = rx.make_block_fn(receiver.mc, receiver.stereo,
                                        receiver.with_rds,
                                        pallas_frontend=True)
    # streaming host-side RDS decode with carried state: CDR carry + bit
    # backlog + pending frames, O(block) host memory however long the run
    # (the reference's per-block decode loop, model/fmRDS.py:256-278)
    rds_dec = (rds_decode.StreamingRdsDecoder(mc.rds.sps, args.rds_algo)
               if with_rds else None)
    first_offsets: list[str] = []

    block_count = 0
    if args.resume:
        from sdr_tpu import checkpoint
        receiver.state, meta = checkpoint.load(args.resume)
        block_count = meta.get("block_count", 0)
        if with_rds and "rds" in meta.get("extra", {}):
            rds_dec = rds_decode.StreamingRdsDecoder.load_state_dict(
                {k[len("rds/"):]: v
                 for k, v in meta["host_arrays"].items()
                 if k.startswith("rds/")},
                meta["extra"]["rds"])
        print(f"resumed from {args.resume} at block {block_count}",
              file=sys.stderr)

    in_stream = sio.stdin_binary() if args.input == "-" else open(
        args.input, "rb")
    out_stream = None
    audio_accum = [] if args.wav else None
    if not args.wav:
        out_stream = sio.stdout_binary() if args.output == "-" else open(
            args.output, "wb")

    # native threaded feed when a real fd is available: the producer thread
    # reads+normalizes ahead of device compute (the reference's
    # producer/consumer queue, now host-side only)
    try:
        from sdr_tpu import native
        source = native.BlockReader(in_stream.fileno(), bs)
    except Exception:
        source = sio.iter_iq_blocks(in_stream, bs)

    n_blocks = 0
    t0 = time.time()
    try:
        for blk in source:
            out = receiver.process(blk)
            if args.stereo:
                audio = np.stack([np.asarray(out.left),
                                  np.asarray(out.right)], axis=-1)
            else:
                audio = np.asarray(out.mono)
            if args.wav:
                audio_accum.append(audio)
            else:
                sio.write_pcm(out_stream, audio)
            if with_rds:
                for _, off in rds_dec.feed(np.asarray(out.rds_symbols)):
                    if len(first_offsets) < 12:
                        first_offsets.append(off)
            n_blocks += 1
    finally:
        if in_stream is not sys.stdin.buffer:
            in_stream.close()

    dt = time.time() - t0
    if args.save_state:
        from sdr_tpu import checkpoint
        extra, host_arrays = {}, {}
        if rds_dec is not None:
            arrays, rmeta = rds_dec.state_dict()
            extra["rds"] = rmeta
            host_arrays = {f"rds/{k}": v for k, v in arrays.items()}
        written = checkpoint.save(args.save_state, receiver.state, args.mode,
                                  block_count=block_count + n_blocks,
                                  extra=extra, host_arrays=host_arrays)
        print(f"state saved to {written} "
              f"(block {block_count + n_blocks})", file=sys.stderr)
    if args.wav:
        audio = (np.concatenate(audio_accum)
                 if audio_accum else np.zeros((0,), np.float32))
        sio.write_wav(args.output, audio, mc.audio_fs)
    elif out_stream is not sys.stdout.buffer:
        out_stream.close()

    if with_rds and n_blocks:
        print(f"RDS: {rds_dec.n_matches} frames "
              f"({', '.join(first_offsets)}"
              f"{'...' if rds_dec.n_matches > 12 else ''})",
              file=sys.stderr)
        st = rds_dec.station_info()
        if st.n_groups:
            pi = f"{st.pi:04X}" if st.pi is not None else "----"
            print(f"RDS station: PI={pi} PTY={st.pty} TP={st.tp} "
                  f"PS={st.ps_name!r} RT={st.radiotext!r} "
                  f"({st.n_groups} groups {st.group_counts})",
                  file=sys.stderr)

    if args.stats and n_blocks:
        pairs = n_blocks * bs / 2
        print(f"{n_blocks} blocks, {pairs / 1e6:.2f} M IQ pairs in "
              f"{dt:.2f}s = {pairs / dt / 1e6:.1f} MS/s "
              f"({pairs / mc.rf_fs / dt:.1f}x real-time)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
