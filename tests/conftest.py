"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (per the build brief): multi-chip
sharding logic is validated without TPU hardware, and numerics are exact
f32 so oracle-parity tests are deterministic. The real-chip benchmark path
lives in bench.py, which does NOT import this file.
"""

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS programmatically, so the env var alone is ignored; config
# updates before any backend init actually select the 8-device CPU mesh.
import os  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-bound on small hosts
# (dozens of engine/train-step programs at ~3-10 s each on 2 cores);
# caching makes the iterate-run loop fast after the first full run.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy test (multiprocess, train-loop e2e, kungfu "
        "learning); skipped by default, run with --runslow or -m slow")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (CI always does; see Makefile)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    if config.getoption("-m"):
        return  # explicit marker expression wins (e.g. `-m slow`)
    skip = pytest.mark.skip(reason="slow: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
