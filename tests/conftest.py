"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding path (`nbody_tpu.parallel`) is exercised without TPU
hardware, and enable x64 so tests can use float64 oracles."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The image's sitecustomize force-registers the axon TPU plugin and rewrites
# jax_platforms to "axon,cpu" regardless of the env var; override it at the
# config level before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
