"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths (jax.sharding.Mesh over 'submaps'/'factors' axes)
are exercised without TPU hardware, as prescribed by SURVEY.md §7's test
strategy ("multi-chip tests with --xla_force_host_platform_device_count").

Note: the environment pre-registers a remote-TPU ('axon') PJRT backend via
sitecustomize before pytest starts, so env vars alone are not enough — we must
override the platform through jax.config *before any backend is initialized*
(conftest import runs before any test module import).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE on the XLA persistent compilation cache: do NOT enable it here. In
# this environment CPU executables may be AOT-compiled with machine features
# of a different host (remote compile service / migrating VMs), and loading
# such a cache entry aborts the whole test process (SIGABRT in
# compilation_cache.get_executable_and_time). Compile times are paid per run
# instead — slower but deterministic.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
