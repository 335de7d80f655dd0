"""Test environment: run everything on CPU with 8 virtual devices so the
sharded (shard_map) paths are exercised without TPU hardware.

Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset axon/tpu
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may have imported jax already (registering
# a TPU backend); override the platform selection before any backend is used.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
