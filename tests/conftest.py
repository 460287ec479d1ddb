"""Test config: force an 8-device virtual CPU mesh.

This lets sharding/pjit tests exercise real SPMD partitioning without TPU
hardware, substituting for the multi-device tests the reference never had
(SURVEY.md §4).

NOTE: in this environment jax is pre-imported at interpreter startup with the
TPU ('axon') platform plugin registered, so JAX_PLATFORMS/XLA_FLAGS env vars
set here would be too late.  jax.config.update works as long as no backend
has been initialised yet, which is the case at conftest import time.
"""

import os

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
