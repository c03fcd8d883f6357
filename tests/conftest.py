"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip behavior (sharding, synchronized step control) is validated on a
virtual CPU mesh, mirroring how the driver dry-runs the multi-chip path.

Note: the sandbox's axon TPU plugin (sitecustomize in /root/.axon_site)
forces ``jax_platforms="axon,cpu"`` via jax.config at interpreter start, so
the JAX_PLATFORMS env var alone does NOT keep tests off the (remote,
high-latency) TPU tunnel — we override the config here, which runs after
sitecustomize.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
