"""Test config: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding is validated on virtual CPU devices (the driver dry-runs
the same path via __graft_entry__.dryrun_multichip); real-TPU perf is
measured separately by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The sandbox's axon TPU plugin ignores JAX_PLATFORMS; force cpu explicitly
# before any backend initialization.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
