"""Pallas kernels vs the XLA/golden paths (interpret mode on CPU; the
driver's TPU runs exercise the compiled kernel via bench/receiver)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sdr_tpu.golden import filters as gfilt
from sdr_tpu.ops import pallas_fir


class TestFirDecimPallas:
    @pytest.mark.parametrize("decim,taps,n", [(10, 151, 4000), (5, 151, 4000),
                                              (3, 101, 3000), (10, 13, 2000)])
    def test_matches_golden(self, rng, decim, taps, n):
        h = gfilt.lowpass_taps(taps, 2.4e6, 100e3)
        x = rng.normal(size=n)
        state = np.zeros(taps - 1)
        gy, _ = gfilt.block_fir_decim(x, h, state, decim)
        jy, js = pallas_fir.fir_block_decim_pallas(
            jnp.asarray(x, jnp.float32), jnp.asarray(h, jnp.float32),
            jnp.asarray(state, jnp.float32), decim, interpret=True)
        np.testing.assert_allclose(jy, gy, atol=2e-5)
        np.testing.assert_allclose(js, x[n - (taps - 1):], atol=1e-6)

    def test_batched(self, rng):
        h = gfilt.lowpass_taps(151, 2.4e6, 100e3)
        xs = rng.normal(size=(2, 4000))
        states = rng.normal(size=(2, 150))
        jy, _ = pallas_fir.fir_block_decim_pallas(
            jnp.asarray(xs, jnp.float32), jnp.asarray(h, jnp.float32),
            jnp.asarray(states, jnp.float32), 10, interpret=True)
        for r in range(2):
            gy, _ = gfilt.block_fir_decim(xs[r], h, states[r], 10)
            np.testing.assert_allclose(jy[r], gy, atol=2e-5)

    def test_batch_tiled(self, rng):
        """Large channel batches stream through a second grid dimension
        (fixed-size VMEM blocks) instead of falling back to the XLA conv;
        padding rows and tile boundaries must not leak into results."""
        h = gfilt.lowpass_taps(151, 2.4e6, 100e3)
        xs = rng.normal(size=(20, 4000))
        states = rng.normal(size=(20, 150))
        xc = jnp.asarray(np.concatenate([states, xs], -1), jnp.float32)
        jy = pallas_fir.fir_decim_pallas(
            xc, jnp.asarray(h, jnp.float32), 10, tile=256, b_tile=8,
            interpret=True)
        for r in range(20):
            gy, _ = gfilt.block_fir_decim(xs[r], h, states[r], 10)
            np.testing.assert_allclose(jy[r], gy, atol=2e-5)

    def test_auto_tiles_bounded(self):
        """The (batch tile, lane tile) choice stays inside the VMEM budget
        at any batch size (the round-1 kernel fell back past ~128ch) AND
        at any unroll depth r_rows — small-decim modes unroll
        ceil(taps/decim) live FMA temps (51 at mode 3's rf_decim=3),
        which the pre-r5 formula ignored and Mosaic OOMed on (VERDICT r4
        #6)."""
        for b in (8, 256, 2048, 8192):
            for d_pad in (8, 16):
                for r_rows in (16, 31, 51):
                    bt, tile = pallas_fir._auto_tiles(b, d_pad, r_rows)
                    per_row = 4 * (d_pad * (3 * tile + 3 * pallas_fir._HALO)
                                   + (r_rows + 1) * tile)
                    assert bt * per_row <= pallas_fir._VMEM_BUDGET_BYTES \
                        or bt == 8       # floor for tiny budgets
                    assert bt % 8 == 0 and tile % 128 == 0 and bt <= b

    def test_mode3_shapes_compile(self):
        """The mode-3 RF shape (rf_decim=3 -> r_rows=51) must run through
        the VPU Pallas FIR (interpret mode here; the r5 TPU check compiled
        and ran all four modes at C=512 on v5e)."""
        import jax.numpy as jnp
        from sdr_tpu import config as cfg
        mc = cfg.get_mode_config(3)
        n = 9600
        x = jnp.zeros((4, 2, n + mc.rf_taps - 1), jnp.float32)
        h = jnp.zeros((mc.rf_taps,), jnp.float32)
        y = pallas_fir.fir_decim_pallas(x, h, mc.rf_decim, interpret=True)
        assert y.shape == (4, 2, n // mc.rf_decim)

    def test_streaming_state_chain(self, rng):
        """Block-to-block state carry equals one contiguous pass."""
        h = gfilt.lowpass_taps(151, 2.4e6, 100e3)
        x = rng.normal(size=8000)
        full, _ = gfilt.block_fir_decim(x, h, np.zeros(150), 10)
        st = jnp.zeros(150, jnp.float32)
        outs = []
        for b in range(2):
            y, st = pallas_fir.fir_block_decim_pallas(
                jnp.asarray(x[b * 4000:(b + 1) * 4000], jnp.float32),
                jnp.asarray(h, jnp.float32), st, 10, interpret=True)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs), full, atol=2e-5)


class TestPllPallas:
    """The Pallas PLL kernel must be BIT-identical to the lax.scan path
    (same elementwise ops, measured bit-equal on v5e hardware too)."""

    def _params(self):
        import jax
        from sdr_tpu.models import receiver as rx
        from sdr_tpu import config as cfg
        mc = cfg.get_mode_config(0)
        return rx.pilot_pll_params(mc), rx.rds_pll_params(mc)

    def test_fused_pair_bit_identical(self):
        import jax
        from sdr_tpu.ops import pll as jpll
        from sdr_tpu.ops import pallas_pll as ppll
        p1, p2 = self._params()
        rng = np.random.default_rng(11)
        fs = p1.fs
        t = np.arange(5760) / fs
        x1 = 0.4 * np.sin(2 * np.pi * 19010 * t) + 0.02 * rng.standard_normal(5760)
        x2 = 0.1 * np.sin(2 * np.pi * 113985 * t) + 0.02 * rng.standard_normal(5760)
        x = jnp.stack([jnp.asarray(x1, jnp.float32),
                       jnp.asarray(x2, jnp.float32)], axis=-2)
        st = jax.tree.map(lambda a, b: jnp.stack([a, b], axis=-1),
                          jpll.pll_init(), jpll.pll_init(nco_q_last=1.0))
        sa = sb = st
        for b in range(3):
            xb = x[..., b * 1920:(b + 1) * 1920]
            ia, qa, sa = jpll.pll_block_fused(xb, sa, (p1, p2))
            ib, qb, sb = ppll.pll_block_fused_pallas(xb, sb, (p1, p2),
                                                     interpret=True)
            np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
            np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))
        for f in sa._fields:
            np.testing.assert_array_equal(np.asarray(getattr(sa, f)),
                                          np.asarray(getattr(sb, f)))

    def test_single_and_batched(self):
        import jax
        from sdr_tpu.ops import pll as jpll
        from sdr_tpu.ops import pallas_pll as ppll
        p1, _ = self._params()
        rng = np.random.default_rng(12)
        # batch of 3 channels -> 3 lanes; plus unbatched call
        xs = rng.standard_normal((3, 2000)).astype(np.float32)
        bst = jax.tree.map(lambda l: jnp.broadcast_to(l, (3,)),
                           jpll.pll_init())
        bi, bq, _ = jpll.pll_block(jnp.asarray(xs), bst, p1)
        pi_, pq, _ = ppll.pll_block_pallas(jnp.asarray(xs), bst, p1,
                                           interpret=True)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(pi_))
        si, _, _ = jpll.pll_block(jnp.asarray(xs[0]), jpll.pll_init(), p1)
        pi1, _, _ = ppll.pll_block_pallas(jnp.asarray(xs[0]),
                                          jpll.pll_init(), p1,
                                          interpret=True)
        np.testing.assert_array_equal(np.asarray(si), np.asarray(pi1))

    def test_mixer_fused_bit_identical(self):
        """pll_mixer_fused_pallas == pll_block_fused + nco[:-1]*mix*2,
        bitwise (interpret mode), including the carried state across a
        chain of blocks (the nco_last/nco_q_last handoff at tile AND
        block boundaries is the subtle part)."""
        import jax
        from sdr_tpu.ops import pll as jpll
        from sdr_tpu.ops import pallas_pll as ppll
        p1, p2 = self._params()
        rng = np.random.default_rng(21)
        fs = p1.fs
        t = np.arange(5760) / fs
        x1 = 0.4 * np.sin(2 * np.pi * 19010 * t) + 0.02 * rng.standard_normal(5760)
        x2 = 0.1 * np.sin(2 * np.pi * 113985 * t) + 0.02 * rng.standard_normal(5760)
        x = jnp.stack([jnp.asarray(x1, jnp.float32),
                       jnp.asarray(x2, jnp.float32)], axis=-2)
        mix = jnp.asarray(rng.standard_normal((2, 5760)), jnp.float32)
        st = jax.tree.map(lambda a, b: jnp.stack([a, b], axis=-1),
                          jpll.pll_init(), jpll.pll_init(nco_q_last=1.0))
        sa = sb = st
        for b in range(3):
            sl = slice(b * 1920, (b + 1) * 1920)
            ia, _, sa = jpll.pll_block_fused(x[..., sl], sa, (p1, p2))
            want = ia[..., :-1] * mix[..., sl] * 2.0
            got, sb = ppll.pll_mixer_fused_pallas(
                x[..., sl], mix[..., sl], sb, (p1, p2), interpret=True)
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
            for f in sa._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(sa, f)), np.asarray(getattr(sb, f)),
                    err_msg=f)

    def test_mixer_fused_batched_single_arm(self):
        """K=1 (stereo-only modes) with a channel batch; non-multiple-of-
        tile lengths exercise the partial final tile."""
        import jax
        from sdr_tpu.ops import pll as jpll
        from sdr_tpu.ops import pallas_pll as ppll
        p1, _ = self._params()
        rng = np.random.default_rng(22)
        x = jnp.asarray(rng.standard_normal((3, 1, 1000)), jnp.float32)
        mix = jnp.asarray(rng.standard_normal((3, 1, 1000)), jnp.float32)
        st = jax.tree.map(lambda l: jnp.broadcast_to(l, (3, 1)),
                          jpll.pll_init())
        ia, _, sa = jpll.pll_block_fused(x, st, (p1,))
        want = ia[..., :-1] * mix * 2.0
        got, sb = ppll.pll_mixer_fused_pallas(x, mix, st, (p1,),
                                              interpret=True)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
        for f in sa._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(sa, f)), np.asarray(getattr(sb, f)))

    def test_receiver_block_with_pallas_pll(self):
        """pallas_pll alone must leave the receiver block BIT-identical
        (same front-end, bit-equal PLL); with pallas_frontend too, outputs
        stay within the 1e-3 parity gate (the front-end's f32 FMA vs the
        conv's 3-pass bf16 rounding is amplified through the unlocked
        PLL's acquisition transient)."""
        import jax
        from sdr_tpu import config as cfg
        from sdr_tpu.models import receiver as rx
        mc = cfg.get_mode_config(0)
        coeffs = rx.design_coeffs(mc)
        rng = np.random.default_rng(13)
        bs = mc.default_block_size(True)
        iq = jnp.asarray(rng.uniform(-1, 1, bs).astype(np.float32))
        st = rx.init_state(mc)
        o1, s1 = rx.process_block(iq, coeffs, st, mc, stereo=True,
                                  with_rds=True)
        o2, s2 = rx.process_block(iq, coeffs, st, mc, stereo=True,
                                  with_rds=True, pallas_pll=True)
        np.testing.assert_array_equal(np.asarray(o1.left),
                                      np.asarray(o2.left))
        np.testing.assert_array_equal(np.asarray(o1.rds_symbols),
                                      np.asarray(o2.rds_symbols))
        o3, _ = rx.process_block(iq, coeffs, st, mc, stereo=True,
                                 with_rds=True, pallas_frontend=True,
                                 pallas_pll=True)
        np.testing.assert_allclose(np.asarray(o3.left), np.asarray(o1.left),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(o3.rds_symbols),
                                   np.asarray(o1.rds_symbols), atol=1e-3)


class TestMxuFrontendPallas:
    """Fused u8 MXU front-end (ops.pallas_fir_mxu): i8 bias-flip + bf16
    normalize + banded weight-split matmul in one kernel.  Same W and
    inputs as the XLA bf16x path; the zero-extended W rows shift f32
    accumulation order, so equality is to 1 ULP, not bitwise."""

    @pytest.mark.parametrize("n,decim,c", [
        (57600, 10, 3),   # mode-0 RF shape (halo block 256 = 2x128)
        (25020, 5, 2),    # mode-1 (halo 640 = 5x128)
        (9600, 3, 1),     # mode-3 (halo 384 = 3x128)
    ])
    def test_bit_identical_to_bf16x(self, rng, n, decim, c):
        from sdr_tpu.ops import fir as jfir
        from sdr_tpu.ops import pallas_fir_mxu as pfm
        k = 151
        h = jnp.asarray(rng.normal(size=k).astype(np.float32) * 0.05)
        u8 = rng.integers(0, 256, size=(c, 2 * n), dtype=np.uint8)
        st32 = jnp.asarray(
            rng.integers(-128, 128, size=(c, 2, k - 1)).astype(np.float32)
            / 128.0)
        iq = jnp.asarray(u8)
        iq2 = jnp.stack([iq[..., 0::2], iq[..., 1::2]], axis=-2)
        iq2 = ((iq2.astype(jnp.bfloat16) - jnp.bfloat16(128.0))
               * jnp.bfloat16(1.0 / 128.0))
        y0, s0 = jfir.fir_block_decim_mm_bf16x(
            iq2, h, st32.astype(jnp.bfloat16), decim)
        y1, s1 = pfm.fir_frontend_u8_pallas(iq, h, st32, decim,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=0, atol=1e-7)
        np.testing.assert_array_equal(
            np.asarray(s1), np.asarray(s0.astype(jnp.float32)))

    def test_streaming_state_chain(self, rng):
        """Chained blocks == one big block (overlap-save via the f32
        state round-trip, which is lossless for u8-normalized values)."""
        from sdr_tpu.ops import pallas_fir_mxu as pfm
        n, k, d = 5760, 151, 10
        h = jnp.asarray(rng.normal(size=k).astype(np.float32) * 0.05)
        u8 = rng.integers(0, 256, size=(2, 4 * 2 * n), dtype=np.uint8)
        whole, _ = pfm.fir_frontend_u8_pallas(
            jnp.asarray(u8), h, jnp.zeros((2, 2, k - 1), jnp.float32), d,
            interpret=True)
        st = jnp.zeros((2, 2, k - 1), jnp.float32)
        parts = []
        for b in range(4):
            y, st = pfm.fir_frontend_u8_pallas(
                jnp.asarray(u8[:, b * 2 * n:(b + 1) * 2 * n]), h, st, d,
                interpret=True)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(parts, -1),
                                   np.asarray(whole), atol=1e-6)

    @pytest.mark.parametrize("n,decim,c,u_blk", [
        (57600, 10, 3, None), (25020, 5, 2, None), (9600, 3, 1, None),
        (57600, 10, 2, 128), (57600, 10, 2, 256)])
    def test_interleaved_variant_matches(self, rng, n, decim, c, u_blk):
        """fir_frontend_u8_pallas_int (interleaved weights, zero relayout)
        vs the deinterleaved kernel: same weight-split math, ULP-level —
        including the non-default window block sizes raced on hardware
        (scripts/ublk_race.py)."""
        from sdr_tpu.ops import pallas_fir_mxu as pfm
        k = 151
        h = jnp.asarray(rng.normal(size=k).astype(np.float32) * 0.05)
        u8 = rng.integers(0, 256, size=(c, 2 * n), dtype=np.uint8)
        st32 = jnp.asarray(
            rng.integers(-128, 128, size=(c, 2, k - 1)).astype(np.float32)
            / 128.0)
        y0, s0 = pfm.fir_frontend_u8_pallas(jnp.asarray(u8), h, st32,
                                            decim, interpret=True)
        y1, s1 = pfm.fir_frontend_u8_pallas_int(jnp.asarray(u8), h, st32,
                                                decim, u_blk=u_blk,
                                                interpret=True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))

    def test_interleaved_short_block_carries_state(self, rng):
        """A block shorter than the filter (N < K-1) must fold part of the
        incoming state into the outgoing tail (ADVICE r3: the tail came
        from the input bytes alone and crashed/was wrong for short
        blocks)."""
        from sdr_tpu.ops import pallas_fir_mxu as pfm
        k, d, n = 151, 10, 140             # n < k - 1
        h = jnp.asarray(rng.normal(size=k).astype(np.float32) * 0.05)
        u8 = rng.integers(0, 256, size=(1, 2 * n), dtype=np.uint8)
        st = jnp.asarray(
            rng.integers(-128, 128, size=(1, 2, k - 1)).astype(np.float32)
            / 128.0)
        y0, s0 = pfm.fir_frontend_u8_pallas(jnp.asarray(u8), h, st, d,
                                            interpret=True)
        y1, s1 = pfm.fir_frontend_u8_pallas_int(jnp.asarray(u8), h, st, d,
                                                interpret=True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))

    def test_interleaved_streaming_state_chain(self, rng):
        from sdr_tpu.ops import pallas_fir_mxu as pfm
        n, k, d = 5760, 151, 10
        h = jnp.asarray(rng.normal(size=k).astype(np.float32) * 0.05)
        u8 = rng.integers(0, 256, size=(2, 4 * 2 * n), dtype=np.uint8)
        whole, _ = pfm.fir_frontend_u8_pallas_int(
            jnp.asarray(u8), h, jnp.zeros((2, 2, k - 1), jnp.float32), d,
            interpret=True)
        st = jnp.zeros((2, 2, k - 1), jnp.float32)
        parts = []
        for b in range(4):
            y, st = pfm.fir_frontend_u8_pallas_int(
                jnp.asarray(u8[:, b * 2 * n:(b + 1) * 2 * n]), h, st, d,
                interpret=True)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(parts, -1),
                                   np.asarray(whole), atol=1e-6)
