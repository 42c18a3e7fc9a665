"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on spoofed host devices, per SURVEY.md
section 4.  The container's sitecustomize imports JAX at interpreter start
with JAX_PLATFORMS=axon already read, so the env var route doesn't work —
we override through jax.config before any backend initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
