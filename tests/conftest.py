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
# Prevent the remote-TPU ("axon") PJRT plugin from being loaded into xdist
# WORKER interpreters: sitecustomize only registers it when
# PALLAS_AXON_POOL_IPS is set, workers inherit this (master) process's env,
# and the foreign plugin in-process correlates with XLA:CPU compiler
# segfaults late in long runs. The master process itself already loaded it
# (sitecustomize ran before us) — harmless, the master runs no tests.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

# XLA:CPU's compiler recurses deeply on the big solver graphs and overflows
# the default 8 MB thread stack (observed: segfaults inside libgcc's
# unwinder, killing pytest workers ~40 tests in). glibc sizes new threads'
# stacks from RLIMIT_STACK, so raise it before any compile thread spawns;
# xdist workers inherit the limit.
import resource  # noqa: E402

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 1024 * 1024
if _hard == resource.RLIM_INFINITY or _hard >= _want:
    resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache, keyed by host: the earlier blanket
# cache SIGABRTed when an entry AOT-compiled on a different machine
# (remote compile service / migrated VM) was loaded; a per-hostname cache
# directory only ever replays same-machine executables, which is safe.
# Repeated suite runs on one machine skip recompiling the big solver
# graphs (the dominant share of the 30-minute suite wall time).
import platform  # noqa: E402
import tempfile  # noqa: E402

_cache_dir = os.path.join(tempfile.gettempdir(),
                          f"beam_slam_xla_cache_{platform.node()}")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.device_count() == 8, jax.devices()


_crash_retries = {}


def pytest_handlecrashitem(crashitem, report, sched):
    """Reschedule tests that died with a crashed xdist worker.

    XLA:CPU's compiler sporadically segfaults (libgcc unwinder) in
    long-lived processes that have compiled many distinct kernels; every
    affected test passes in a fresh process. xdist restarts the worker
    (--max-worker-restart) and this hook re-queues the victim test up to
    twice instead of reporting a spurious failure.
    """
    n = _crash_retries.get(crashitem, 0)
    if n < 2:
        _crash_retries[crashitem] = n + 1
        sched.mark_test_pending(crashitem)
        report.outcome = "rescheduled"


@pytest.fixture
def rng():
    return np.random.default_rng(42)
