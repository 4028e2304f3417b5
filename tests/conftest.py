"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual device mesh
(xla_force_host_platform_device_count), mirroring how the driver dry-runs the
multi-chip path. The axon TPU plugin force-sets JAX_PLATFORMS, so we override
through jax.config (which wins over the env var) before any backend is
initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
