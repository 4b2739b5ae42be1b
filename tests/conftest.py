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


import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (also TPUSDR_SLOW=1)",
    )


def pytest_collection_modifyitems(config, items):
    """Default run skips `slow`-marked tests so the suite stays under ~6
    minutes (VERDICT r2 next #10); `--runslow` / TPUSDR_SLOW=1 restores the
    full suite.  Every slow test has a fast sibling covering the same
    property at a smaller shape."""
    if config.getoption("--runslow") or os.environ.get("TPUSDR_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow; use --runslow or TPUSDR_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
