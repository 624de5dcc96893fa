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
