"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise real collectives without TPU hardware (SURVEY.md section 4)."""

import os
import sys

# The axon-plugin re-exec guard lives in _pytest_boot.py (loaded by
# pytest.ini addopts BEFORE fd capture starts — exec'ing from here loses
# all terminal output; see that module's docstring).  This fallback only
# covers pytest invocations that bypassed pytest.ini (e.g. from another
# cwd); output loss there beats a relay-outage hang.
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
