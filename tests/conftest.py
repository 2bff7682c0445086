"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding path (`nbody_tpu.parallel`) is exercised without TPU
hardware, and enable x64 so tests can use float64 oracles."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "collective_call_terminate" not in flags:
    # XLA CPU collectives F-abort the process when a virtual device misses
    # the rendezvous for 40 s — which sharded tests can do on this
    # single-core host whenever another job has the core (CLAUDE.md)
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The image's sitecustomize force-registers the axon TPU plugin and rewrites
# jax_platforms to "axon,cpu" regardless of the env var; override it at the
# config level before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Most of the suite's wall time is XLA compiles of the big traversal
# programs (the slowest-30 list is a flat 10-25 s compile tail).  The
# persistent compile cache makes repeat runs warm: ~570 s cold -> ~3 min
# warm.  Keyed by HLO hash, so code changes invalidate exactly the
# programs they touch.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_CACHE",
                   os.path.expanduser("~/.cache/jax_nbody_tests")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (large-N domain decomposition, heavy "
        "quadrupole sweeps; adds ~10 min)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy test, deselected by default (--runslow)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: needs --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
