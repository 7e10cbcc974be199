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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
