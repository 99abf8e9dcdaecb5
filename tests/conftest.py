"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise real collectives without TPU hardware (SURVEY.md section 4)."""

import os
import sys

# The environment's sitecustomize registers a TPU (axon) PJRT plugin at
# interpreter start whenever PALLAS_AXON_POOL_IPS is set.  jax's
# ``backends()`` then initializes EVERY registered plugin — so the first
# ``jax.devices('cpu')`` call hangs/fails whenever the TPU relay is down,
# even under JAX_PLATFORMS=cpu (observed: round-2 outage took the whole
# CPU test suite down with it).  Registration has already happened by the
# time this file runs, so the only reliable fix is to re-exec the test
# process once with the trigger variable removed.
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "_DIFFSOUND_TEST_REEXEC"
):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["_DIFFSOUND_TEST_REEXEC"] = "1"
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU even if the ambient environment pins a TPU platform: unit tests
# validate numerics in f64 and emulate multi-chip sharding on host devices.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
