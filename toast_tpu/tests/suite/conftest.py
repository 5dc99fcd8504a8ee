"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that sharding logic is exercised
without TPU hardware (the driver separately dry-run-compiles the multi-chip
path and benches on a real chip).  Environment must be set before JAX import.
"""

import os

_platform = os.environ.get("TOAST_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (sitecustomize) programmatically forces
# jax_platforms="axon,cpu", overriding the environment variable.  Re-force
# the requested platform before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
