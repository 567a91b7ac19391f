"""Host-side RDS symbol->bit->frame decode for the TPU receiver.

Everything at IF rate and above runs on device (sdr_tpu.models.receiver);
the CDR/Manchester/differential/framesync chain operates at 2375 symbols/s —
0.25 ms of work per second of signal in the reference (BASELINE.md Table 5) —
and is control-flow heavy (data-dependent restarts, model/fmSupportLib.py:
103-201), so it stays on host by design (SURVEY.md §7 step 5).

Two decoders are offered:
 * ``decode_reference`` — the reference-faithful per-block CDR with carried
   state (golden.rds.cdr), for parity testing.
 * ``decode_robust``    — the production path: restart-free phase/parity
   estimation over the whole symbol stream (golden.rds.cdr_robust), immune
   to the reference algorithm's fragility under noise.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from sdr_tpu.golden import rds as grds


@dataclasses.dataclass
class RdsDecodeResult:
    bits: np.ndarray                      # post-differential-decode bits
    frames: grds.FrameSyncResult
    info_words: np.ndarray                # (n_frames, 16) info bits per match


def _info_words(bits: np.ndarray,
                frames: grds.FrameSyncResult) -> np.ndarray:
    return np.array([bits[pos:pos + 16] for pos, _ in frames.matches],
                    dtype=np.int64).reshape(-1, 16)


def decode_robust(symbols: np.ndarray, sps: int,
                  window_symbols: int | None = None) -> RdsDecodeResult:
    """Decode a whole soft-symbol stream (concatenated RRC outputs).

    ``symbols`` may be (n_blocks, sym_len) stacked scan output or a flat
    stream; blocks are concatenated in time order.  ``window_symbols``
    enables the clock-drift-tracking CDR (golden.rds.cdr_tracking) for
    inputs whose transmit symbol clock drifts against the receiver grid.
    """
    x = np.asarray(symbols).reshape(-1)
    if window_symbols:
        manch = grds.cdr_tracking(x, sps, window_symbols)
    else:
        manch, _, _ = grds.cdr_robust(x, sps)
    bits = grds.diff_decode(manch)
    frames = grds.frame_sync(bits)
    return RdsDecodeResult(bits, frames, _info_words(bits, frames))


def decode_reference(symbols_blocks: np.ndarray, sps: int) -> RdsDecodeResult:
    """Reference-faithful streaming decode over stacked per-block symbols
    (model/fmRDS.py:256-278 block loop)."""
    st = grds.CdrState()
    backlog = np.zeros(0, dtype=np.int64)
    all_bits: list[np.ndarray] = []
    all_matches: list[tuple[int, str]] = []
    consumed_total = 0
    for b, blk in enumerate(np.asarray(symbols_blocks)):
        manch, st = grds.cdr(blk, sps, st, b)
        bits = grds.diff_decode(manch)
        all_bits.append(bits)
        stream = np.concatenate([backlog, bits])
        frames = grds.frame_sync(stream)
        for pos, off in frames.matches:
            all_matches.append((consumed_total + pos, off))
        consumed_total += frames.consumed
        backlog = stream[frames.consumed:]
    bits = np.concatenate(all_bits) if all_bits else np.zeros(0, np.int64)
    frames = grds.FrameSyncResult(
        all_matches, consumed_total,
        all_matches[-1][1] if all_matches else "")
    return RdsDecodeResult(bits, frames, _info_words(bits, frames))
