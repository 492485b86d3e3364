"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (per the build brief): multi-chip
sharding logic is validated without TPU hardware, and numerics are exact
f32 so oracle-parity tests are deterministic. The real-chip benchmark path
lives in bench.py, which does NOT import this file.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
