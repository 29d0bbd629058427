"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on the
standard XLA host-platform device simulation (SURVEY.md §4e).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A pytest plugin may import jax before this conftest runs; force the
# platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
