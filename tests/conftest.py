"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The real TPU is reserved for benchmarking (bench.py); unit tests exercise the
same jitted code paths (including multi-chip sharding) on host CPU devices.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute Monte-Carlo suites (BLER parity, HARQ anchor, "
        "link e2e); deselect with -m 'not slow' for the quick tier")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_per_module():
    """XLA:CPU in this jax build (0.9.0) segfaults inside
    backend_compile_and_load after a few hundred in-process compilations
    (reproduced twice on 2026-08-21 at ~85% of the full suite — at a
    DIFFERENT test each time once one was isolated, i.e. it tracks the
    accumulated compile count, not any specific program). Dropping the jit
    caches at each module boundary keeps the live-executable population
    bounded; module-scoped fixtures die with their module, so nothing
    recompiles within a module."""
    yield
    jax.clear_caches()
