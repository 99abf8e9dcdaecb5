"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise real collectives without TPU hardware (SURVEY.md section 4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU even if the ambient environment pins a TPU platform: unit tests
# validate numerics in f64 and emulate multi-chip sharding on host devices.
# The env var alone is not enough when a sitecustomize registers a TPU
# plugin at interpreter start, so also override via jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
