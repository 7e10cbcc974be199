"""Test harness configuration.

All tests run on CPU with 8 virtual XLA devices so that the multi-chip
sharding paths (DP psum over a mesh) are exercised without TPU hardware.
The env vars must be set before jax initializes its backends, hence the
top-of-module placement and the sitecustomize-style guard.
"""

import os

# hard-set (the environment pre-sets JAX_PLATFORMS to the TPU plugin;
# tests must run on the virtual CPU mesh regardless)
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

# jax is already imported by the environment's sitecustomize before this file
# runs, so the env var alone is not enough — force the platform via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
