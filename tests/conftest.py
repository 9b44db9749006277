"""Test harness: force an 8-virtual-device CPU platform before jax imports.

Multi-chip sharding is validated on a virtual CPU mesh (real multi-chip
hardware is exercised by the driver's dryrun); numerics tests also run on
CPU for determinism and speed.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend via the
# config API as well (must happen before any backend is initialized).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"


@pytest.fixture
def rng():
    return np.random.default_rng(1981)
