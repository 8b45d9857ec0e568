"""Persistent XLA compilation cache setup, shared by cli/bench/entry.

Compiles of the fused sweep/backend programs are expensive (minutes over the
axon TPU tunnel, tens of seconds on CPU); caching them on disk makes every
entry point after the first pay ~0 compile cost.  Backend-specific cache
directories avoid mixing TPU and CPU executables.
"""

from __future__ import annotations

import hashlib
import os


def _cpu_feature_tag() -> str:
    """Short hash of the host CPU's feature flags: XLA:CPU AOT executables
    are machine-feature-specific, and loading one compiled on a different
    host emits SIGILL-risk warnings (seen in MULTICHIP_r02.json) — keying
    the CPU cache dir by features keeps each host's cache clean."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:8]


def setup_compilation_cache(root: str = None):
    import jax

    if root is None:
        root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    plat = jax.default_backend()
    sub = (".jax_cache" if plat != "cpu"
           else f".jax_cache_cpu_{_cpu_feature_tag()}")
    cache_dir = os.path.join(root, sub)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
