"""Test harness: force CPU with an 8-device virtual mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4 implication
(c)), and so tests never contend with benchmarks for the real chip.

Note: installed pytest plugins (jaxtyping) import jax before this conftest
runs, so setting JAX_PLATFORMS in os.environ is too late — the jax config
must be updated explicitly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it
jax.config.update("jax_enable_x64", True)  # rotations are validated in f64 on host

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
