"""Test environment: run everything on CPU with 8 virtual devices so that
multi-chip sharding logic is exercised without TPU hardware (the driver
dry-runs the real multi-chip path separately via __graft_entry__).

Note: this environment pins `jax_platforms` to the axon TPU at import time, so
the env var alone is not enough — we override the config explicitly."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
