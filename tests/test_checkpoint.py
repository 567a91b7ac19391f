"""Checkpoint/resume: block-k restart must be bit-identical to
uninterrupted streaming (SURVEY.md §5 contract)."""

import numpy as np
import pytest

from sdr_tpu import checkpoint
from sdr_tpu import config as cfg
from sdr_tpu.models import receiver as trx
from sdr_tpu.utils import synth


class TestNpzRoundtrip:
    def test_block_k_restart_bit_identical(self, tmp_path):
        mc = cfg.get_mode_config(0)
        bs = mc.default_block_size(with_rds=True)
        res = synth.synthesize_fm(duration_s=0.25, mode=0, with_rds=True,
                                  seed=8)
        iq = synth.u8_to_float(res.iq_u8)
        n_blocks = len(iq) // bs

        # uninterrupted run
        rx1 = trx.Receiver(0, stereo=True, with_rds=True)
        outs1 = [rx1.process(iq[b * bs:(b + 1) * bs])
                 for b in range(n_blocks)]

        # run 2 blocks, checkpoint, restart in a fresh receiver
        rx2 = trx.Receiver(0, stereo=True, with_rds=True)
        for b in range(2):
            rx2.process(iq[b * bs:(b + 1) * bs])
        p = str(tmp_path / "state.npz")
        checkpoint.save(p, rx2.state, mode=0, block_count=2)

        rx3 = trx.Receiver(0, stereo=True, with_rds=True)
        state, meta = checkpoint.load(p)
        assert meta["block_count"] == 2
        rx3.state = state
        for b in range(2, n_blocks):
            out = rx3.process(iq[b * bs:(b + 1) * bs])
            np.testing.assert_array_equal(np.asarray(out.left),
                                          np.asarray(outs1[b].left))
            np.testing.assert_array_equal(np.asarray(out.rds_symbols),
                                          np.asarray(outs1[b].rds_symbols))

    def test_orbax_roundtrip(self, tmp_path):
        import jax
        rx1 = trx.Receiver(0, stereo=True, with_rds=True)
        # make the state non-trivial
        res = synth.synthesize_fm(duration_s=0.05, mode=0, seed=2)
        iq = synth.u8_to_float(res.iq_u8)
        bs = cfg.get_mode_config(0).default_block_size(True)
        rx1.process(iq[:bs])
        d = str(tmp_path / "orbax_ck")
        checkpoint.save_orbax(d, rx1.state)
        template = trx.init_state(cfg.get_mode_config(0))
        restored = checkpoint.load_orbax(d, template)
        for a, b in zip(jax.tree.leaves(restored),
                        jax.tree.leaves(rx1.state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_meta_and_shapes_preserved(self, tmp_path):
        mc = cfg.get_mode_config(2)
        rx1 = trx.Receiver(2, stereo=True, with_rds=True)
        p = str(tmp_path / "s.npz")
        checkpoint.save(p, rx1.state, mode=2, block_count=7,
                        extra={"station": "test"})
        state, meta = checkpoint.load(p)
        assert meta["mode"] == 2 and meta["extra"]["station"] == "test"
        import jax
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(rx1.state)):
            assert a.shape == b.shape and a.dtype == b.dtype
