"""Test configuration: force an 8-virtual-device CPU JAX backend.

The sandbox pre-imports jax (axon TPU platform) via PYTHONPATH site hooks,
so env vars alone are too late; ``jax.config.update`` reinitializes the
backend.  Tests run on 8 virtual CPU devices so multi-chip sharding tests
(SURVEY.md §4e) can build a mesh without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
