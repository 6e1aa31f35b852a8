"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4 implication (c))."""

import os

# Force CPU even when the session environment points JAX at a TPU platform
# (tests must not contend for the real chip, and sharding tests need the
# 8-device virtual mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)  # rotations are validated in f64 on host
