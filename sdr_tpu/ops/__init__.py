"""TPU-native DSP primitives (JAX/XLA; Pallas kernels in sdr_tpu.ops.pallas).

Design mapping from the reference's kernel library (src/filter.cpp):

=====================================  =====================================
Reference kernel                       TPU-native formulation
=====================================  =====================================
convolveFIR / convolveBlockFIR         XLA conv_general_dilated (stride 1)
convolveBlockFastFIR (decimating)      conv_general_dilated, window_strides=D
convolveBlockResampleFIR (polyphase)   phase-gathered window dot (default) or
                                       conv with lhs_dilation=U, strides=D
fmDemod                                vectorized elementwise (VPU)
fmPLL                                  lax.scan recurrence (+ Pallas kernel)
allPass                                static slice + concat
upsample/downsample                    lhs_dilation / strided slice
DFT / FFT / estimatePSD                matmul DFT (MXU) / jnp.fft / rfft PSD
=====================================  =====================================

All streaming ops keep the reference's ``(y, new_state)`` contract with the
state being the trailing ``taps-1`` input samples (or its natural-domain
equivalent for the polyphase resampler), so device state pytrees are
checkpointable and bit-comparable to the golden model.
"""

from sdr_tpu.ops.fir import (  # noqa: F401
    fir_block,
    fir_block_decim,
    fir_block_resample,
    allpass_delay,
    resample_state_len,
)
from sdr_tpu.ops.demod import fm_demod_quad, fm_demod_arctan  # noqa: F401
from sdr_tpu.ops.pll import PllParams, pll_init, pll_block  # noqa: F401
from sdr_tpu.ops.spectrum import dft_matmul, estimate_psd  # noqa: F401
