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
