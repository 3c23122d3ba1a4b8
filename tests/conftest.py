"""Test bootstrap: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding paths are validated on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the capability the
reference lacks entirely (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: the test host may have a single CPU core, so
# re-compiling identical XLA programs dominates wall clock without this.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# The axon TPU plugin ignores the JAX_PLATFORMS env var — force CPU through
# the config API (verified: env var alone still selects the TPU backend).
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
