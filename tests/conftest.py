"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (per the build brief): multi-chip
sharding logic is validated without TPU hardware, and numerics are exact
f32 so oracle-parity tests are deterministic. The real-chip benchmark path
lives in bench.py, which does NOT import this file.
"""

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS programmatically, so the env var alone is ignored; config
# updates before any backend init actually select the 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
