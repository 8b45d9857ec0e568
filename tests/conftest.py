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

# Persistent compilation cache for the CPU test config (VERDICT r1 item 10):
# the fused sweep/backend programs dominate cold-suite runtime; caching them
# makes the full suite complete in one invocation.  XLA:CPU AOT reloads log
# benign SIGILL-risk warnings (compile-preference pseudo-features,
# utils/cache.py docstring) — accepted here for the suite-runtime win.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
