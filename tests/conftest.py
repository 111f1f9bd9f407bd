"""Test harness.

Two jobs:
  1. Re-exec pytest with the axon TPU-tunnel site customization stripped.
     With the tunnel's sitecustomize loaded, *every* XLA compile stalls
     ~10-20 s wall (remote relay round-trips) even on the CPU backend; our
     tests run on CPU and would take an hour instead of minutes.  The
     re-exec happens in pytest_configure — before any test module (and
     hence jax) is imported — with capture suspended so output flows.
  2. Force a virtual 8-device CPU platform so multi-chip sharding tests run
     without TPU hardware (SURVEY.md §4 implication).
"""

import os
import sys

_MARK = "ASLAM_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_MARK):
        return False
    pythonpath = os.environ.get("PYTHONPATH", "")
    return ".axon_site" in pythonpath or os.environ.get("JAX_PLATFORMS") == "axon"


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env[_MARK] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *config.invocation_params.args],
        env,
    )


# Environment for the (re-exec'd) test process itself; must be set before
# jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: the suite compiles hundreds of CPU programs;
# repeat runs (driver rounds, local iteration) hit the disk cache instead
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aslam_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# The suite compiles hundreds of large CPU executables; holding all of them
# live for ~190 tests exhausts process resources (deterministic SIGSEGV in
# XLA around test #157 regardless of which tests ran).  Dropping the
# in-memory jit caches every N tests caps the footprint; the persistent
# disk cache (above) makes re-tracing a cheap deserialization, not a
# recompile.
_TEARDOWN_COUNT = 0


def pytest_runtest_teardown(item, nextitem):
    global _TEARDOWN_COUNT
    _TEARDOWN_COUNT += 1
    if _TEARDOWN_COUNT % 30 == 0:
        import gc

        import jax

        jax.clear_caches()
        gc.collect()
