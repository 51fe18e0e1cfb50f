"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware (the driver separately dry-runs
the multi-chip path via __graft_entry__.dryrun_multichip).

Note: the environment may import jax at interpreter start (sitecustomize), so
JAX_PLATFORMS must be overridden via jax.config, not os.environ.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running golden renders (deselect with -m 'not slow')")
