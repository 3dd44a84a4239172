"""Test env: force an 8-device virtual CPU mesh so sharding paths are
exercised without burning the real TPU chip.

The container's sitecustomize imports jax at interpreter start and pins
JAX_PLATFORMS=axon (the TPU tunnel), so env vars set here are too late —
the working override is the config API before the first backend query,
plus XLA_FLAGS (read lazily at CPU client init)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
