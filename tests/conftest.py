"""Test configuration: simulate 8 devices on CPU and enable x64.

The reference could only test its distributed path on two physical GPUs
(parallel-two-cards/README.md); we test sharding on a virtual 8-device CPU
mesh instead (SURVEY.md §4), so the whole suite runs anywhere.

NOTE: in this environment jax is pre-imported at interpreter startup with
JAX_PLATFORMS=axon (the TPU tunnel), so env vars are too late — the
platform must be forced through jax.config before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
