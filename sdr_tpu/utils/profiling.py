"""Per-stage timing spans + analytical MAC accounting (SURVEY.md §5).

The reference wraps every pipeline stage in chrono spans accumulated into
per-stage totals (src/project.cpp:72-91,193-290) and reports MAC/sample
figures (report Tables 1-2, computed from tap counts and rate ratios;
``multCount`` instrumentation src/filter.cpp:164-215).  Here:

* ``StageTimer`` — context-manager spans with cumulative totals and a
  report() mirroring the reference's end-of-run printout.  Note: on TPU,
  stages inside one jitted program are fused by XLA and cannot be timed
  individually from the host; StageTimer times host-visible units (whole
  blocks, IO, host decode).  For intra-program profiles use
  ``trace_to(dir)`` (jax.profiler) and the TensorBoard trace viewer.
* ``mac_per_audio_sample`` — the analytical MAC model reproducing report
  Table 1 exactly (1111/1313/~1200/~1567 mono, 2121/2525/~2300/~3033
  stereo for modes 0-3 at 101 taps) — our cost-model ground truth.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

from sdr_tpu import config as cfg


class StageTimer:
    """Cumulative per-stage wall-clock spans
    (ref: src/project.cpp:72-91 pattern)."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, stage: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[stage] += dt
            self.counts[stage] += 1

    def report(self) -> str:
        lines = [f"{'stage':<24}{'total ms':>12}{'calls':>8}{'ms/call':>12}"]
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[k] * 1e3
            n = self.counts[k]
            lines.append(f"{k:<24}{t:>12.2f}{n:>8}{t / n:>12.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def mac_per_audio_sample(mc: cfg.ModeConfig, stereo: bool = False,
                         taps: int = 101) -> float:
    """MAC per output audio sample (report Table 1 model).

    Front-end: I+Q decimating FIRs produce one IF sample each per
    ``audio_decim/audio_upsamp`` audio samples at ``taps`` MACs apiece;
    mono resampler contributes ``taps`` MACs per audio sample (polyphase:
    ceil(taps*U / U) == taps); the stereo arm adds pilot+stereo band-pass
    at IF rate plus its own resampler.
    """
    if_per_audio = mc.audio_decim / mc.audio_upsamp
    front_end = 2 * taps * if_per_audio
    mono = front_end + taps
    if not stereo:
        return mono
    # Table 1's stereo increment is exactly the pilot+stereo band-pass pair
    # at IF rate (2121-1111 = 2*101*5 for mode 0); the reference does not
    # count the stereo arm's own audio FIR there — reproduced as-is so our
    # numbers are comparable to theirs.
    stereo_arm = 2 * taps * if_per_audio
    return mono + stereo_arm


def macs_per_second(mc: cfg.ModeConfig, stereo: bool = False,
                    taps: int = 101) -> float:
    """Aggregate MAC/s at the mode's audio rate — roofline numerator."""
    return mac_per_audio_sample(mc, stereo, taps) * mc.audio_fs
