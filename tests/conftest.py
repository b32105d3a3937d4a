"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding code is exercised without TPU hardware via
``xla_force_host_platform_device_count`` — the JAX-native way to test
mesh/collective code (SURVEY.md §4).
"""
import os

# force-override: the container presets JAX_PLATFORMS=axon (TPU tunnel)
# and its sitecustomize imports jax eagerly, so the env var alone is too
# late — update jax.config directly before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rng():
    # module-scoped on purpose: a session-wide generator couples every
    # module's random data to the global test-file ordering, so adding
    # a file changes downstream data and can flip statistical
    # thresholds (observed twice). Per-module streams keep the blast
    # radius of new tests inside their own module.
    return np.random.default_rng(0)
