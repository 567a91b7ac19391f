"""Test configuration.

JAX runs on CPU with 8 virtual devices so multi-chip sharding logic
(mesh/pjit/shard_map/ppermute) is exercised without TPU hardware; the driver
separately compile-checks the real-TPU path via __graft_entry__.py.

Note: this environment pre-imports jax at interpreter startup (axon
sitecustomize) and pins JAX_PLATFORMS=axon, so plain env vars are too late —
we must force the platform through jax.config before any backend
initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

# CLI/bench entry points probe the (flaky, tunneled) accelerator in a
# subprocess before falling back; tests are pinned to CPU, so the probe is
# pure timeout exposure — skip it outright.
os.environ["SDR_TPU_NO_PROBE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
