"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4: "multi-chip tests runnable on
CPU via jax device-count override").
"""

import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS; pin the platform via jax.config
# before any test imports jax (tests must run on the virtual CPU mesh).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
