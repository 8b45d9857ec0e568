"""Test environment: 8 virtual CPU devices (multi-chip sharding tests run on a
virtual mesh, per the driver's dryrun contract), float64 enabled for math
parity checks against closed forms / finite differences."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; the config
# knob wins over it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
