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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Inner-loop subset: `pytest -m fast` runs the suite minus the
# compile-heavy modules below (whole-solve kernels, per-sample vmap
# engines, mesh tests, experiment subprocess smokes) and finishes in
# well under 5 minutes. Full-suite coverage is unchanged — marks only
# partition, they never skip by default.
_SLOW_MODULES = {
    "test_whole_solve",
    "test_sde_whole_solve",
    "test_pallas_fused",
    "test_pallas_generic",
    "test_per_sample",
    "test_parallel",
    "test_tensor_parallel",
    "test_experiments_smoke",
    "test_rosenbrock",
    "test_nfe_parity",
    "test_adjoint",
    "test_sde",
    "test_gradients",
    "test_tp",
    "test_brownian_stack",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
