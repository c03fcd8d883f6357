"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip behavior (sharding, synchronized step control) is validated on a
virtual CPU mesh, mirroring how the driver dry-runs the multi-chip path.
Must set the env vars before JAX initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
