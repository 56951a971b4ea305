"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is exercised by bench.py and the driver's compile checks; unit
tests validate math and sharding on CPU so they run anywhere.
"""

import os

# Force CPU even when the environment selects a TPU platform (e.g. axon):
# unit tests validate math/sharding and must run anywhere, fast.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon plugin force-selects jax_platforms="axon,cpu" regardless of the
# env var; pin the config explicitly before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
