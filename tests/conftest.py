"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding logic (halo exchange, channel sharding) is verified on a
virtual CPU mesh per SURVEY.md section 4; the real-TPU path is exercised by
bench.py and the driver's compile checks.  The platform override must happen
before jax initializes, and must beat any JAX_PLATFORMS already set in the
environment (the dev box tunnels a real TPU).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin registers itself from sitecustomize and overrides
# JAX_PLATFORMS via jax.config; override it back before any backend
# initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
