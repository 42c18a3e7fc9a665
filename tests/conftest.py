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

# persistent compilation cache: model-sized jits dominate suite time
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
