"""sdr_tpu — a TPU-native software-defined FM radio framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
FM receiver (mnigm2001/Software-Defined-Radio): raw 8-bit interleaved I/Q
samples -> mono audio, stereo audio, and RDS data.

Design stance (TPU-first, not a port):

* Every FIR (plain / decimating / polyphase rational-resampling) is a single
  XLA ``conv_general_dilated`` — strides express decimation, LHS dilation
  expresses upsampling.  No scalar loops.
* Streaming is a ``lax.scan`` over fixed-size blocks with an explicit,
  checkpointable state pytree — not producer/consumer threads.
* The per-sample PLL recurrence is a ``lax.scan`` (and a Pallas kernel for
  the optimized path); everything at or above IF rate runs on the device,
  symbol-rate RDS bit decode runs on the host (it is ~kb/s).
* Scaling is sharding: a channel batch axis over a ``jax.sharding.Mesh``
  (data-parallel) and time-sharding of long recordings with overlap-save
  halo exchange (sequence-parallel), not NCCL/MPI threads.

Layer map (mirrors SURVEY.md section 1):

* ``sdr_tpu.config``   — typed per-mode parameter tables (ref: src/project.cpp:424-427)
* ``sdr_tpu.golden``   — numpy golden model, the correctness oracle
  (ref: model/fmSupportLib.py)
* ``sdr_tpu.ops``      — JAX/XLA/Pallas DSP primitives (ref: src/filter.cpp)
* ``sdr_tpu.models``   — processing paths: frontend/mono/stereo/RDS/receiver
  (ref: src/project.cpp:40-382, model/stereo.py, model/fmRDS.py)
* ``sdr_tpu.parallel`` — mesh sharding: channel-parallel and time-sharding
* ``sdr_tpu.io``       — raw IQ readers, PCM/WAV writers, host feed
  (ref: src/iofunc.cpp)
* ``sdr_tpu.runtime``  — native C++ host runtime bindings (ref: src/project.cpp:384-500)
* ``sdr_tpu.utils``    — synthesis, logging, plotting, checkpointing
"""

__version__ = "0.1.0"

from sdr_tpu.config import Mode, ModeConfig, get_mode_config  # noqa: F401
