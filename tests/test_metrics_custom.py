"""Metrics API + custom sample-rate configurations."""

import numpy as np
import pytest

from sdr_tpu import config as cfg
from sdr_tpu.models import receiver as trx
from sdr_tpu.utils import metrics, synth


class TestMetrics:
    def test_separation_and_accuracy(self):
        res = synth.synthesize_fm(duration_s=0.2, mode=0, seed=44,
                                  with_rds=False)
        rx = trx.Receiver(0, stereo=True)
        outs = rx.run(res.iq_u8)
        sep_l, sep_r = metrics.stereo_separation_db(
            np.asarray(outs.left).reshape(-1),
            np.asarray(outs.right).reshape(-1),
            cfg.get_mode_config(0).audio_fs, 800.0, 1500.0)
        assert sep_l > 25 and sep_r > 25
        hits, total = metrics.rds_accuracy(
            np.zeros((0, 16), np.int64), np.zeros((0, 4, 16), np.int64))
        assert (hits, total) == (0, 0)

    def test_tone_snr(self):
        fs = 48000.0
        t = np.arange(8192) / fs
        x = np.sin(2 * np.pi * 1000.0 * t) + 0.01 * np.random.default_rng(
            0).normal(size=8192)
        assert metrics.tone_snr_db(x, fs, 1000.0) > 20


class TestOneCallApi:
    def test_receive_from_array_and_file(self, tmp_path):
        import sdr_tpu

        res = synth.synthesize_fm(duration_s=0.25, mode=0, seed=26,
                                  with_rds=True)
        out = sdr_tpu.receive(res.iq_u8, mode=0)
        assert out.audio_fs == 48000.0
        sep_l, _ = metrics.stereo_separation_db(out.left, out.right,
                                                out.audio_fs, 800.0, 1500.0)
        assert sep_l > 25
        hits, total = metrics.rds_accuracy(out.rds_info_words,
                                           res.rds_info_bits)
        assert total >= 6 and hits >= total - 1

        p = str(tmp_path / "cap.raw")
        res.iq_u8.tofile(p)
        out2 = sdr_tpu.receive(p, mode=0, stereo=False, rds=False)
        assert out2.left is None and len(out2.rds_frames) == 0
        # block sizes differ between rds/non-rds runs: compare the common
        # prefix (same samples, different end-of-file truncation)
        n = min(len(out2.mono), len(out.mono))
        np.testing.assert_allclose(out2.mono[:n], out.mono[:n], atol=1e-6)

    def test_receive_handles_short_and_tiny_captures(self):
        import sdr_tpu

        res = synth.synthesize_fm(duration_s=0.06, mode=0, seed=2,
                                  with_rds=False)
        # shorter than one default block: still demodulates via a smaller
        # block + tail
        out = sdr_tpu.receive(res.iq_u8, mode=0, rds=False)
        mc = cfg.get_mode_config(0)
        gran = mc.if_block_multiple(False) * 2 * mc.rf_decim
        expect = len(res.iq_u8) // gran * gran // (2 * mc.rf_decim * 5)
        assert len(out.mono) == expect
        # sub-block-multiple capture: clear error, not empty output
        with pytest.raises(ValueError, match="shorter than one block"):
            sdr_tpu.receive(res.iq_u8[:50], mode=0)


class TestCustomMode:
    def test_custom_rates_receive(self):
        """A custom 1.92 MS/s RF / 192 kS/s IF / 32 kHz audio mode runs
        end-to-end (rates outside the four group-28 modes)."""
        mc = cfg.custom_mode(rf_fs=1.92e6, if_fs=192e3, audio_fs=32e3)
        assert mc.rf_decim == 10 and mc.audio_decim == 6
        assert mc.audio_upsamp == 1

        # synthesize at the custom rate: reuse the mode-0 synth math by
        # building the multiplex manually
        fs = mc.rf_fs
        n = int(0.1 * fs)
        t = np.arange(n) / fs
        audio = 0.8 * np.sin(2 * np.pi * 700.0 * t)
        # keep per-IF-sample phase steps small: the quad discriminator
        # emits sin(dphi), so large deviation distorts (verify SKILL.md)
        phase = 2 * np.pi * 10e3 * np.cumsum(audio) / fs
        iq = np.empty(2 * n, np.float32)
        iq[0::2] = np.cos(phase)
        iq[1::2] = np.sin(phase)

        rx = trx.Receiver(mc, stereo=False)
        outs = rx.run(iq)
        mono = np.asarray(outs.mono).reshape(-1)[2000:]
        assert metrics.tone_snr_db(mono, mc.audio_fs, 700.0) > 10

    def test_invalid_rate_rejected(self):
        with pytest.raises(ValueError):
            cfg.custom_mode(rf_fs=2.4e6, if_fs=230e3, audio_fs=48e3)
