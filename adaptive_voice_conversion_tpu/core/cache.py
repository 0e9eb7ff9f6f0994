"""Persistent XLA compilation cache.

The thin-host deployments this framework targets (e.g. a 2-vCPU tunnel
host in front of a TPU) pay minutes of host-side XLA compile time for the
fused multi-step training programs. Enabling JAX's persistent compilation
cache makes every program a one-time cost per (shape, config) — repeat
bench/CLI invocations start in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``
    (default: <repo>/.xla_cache, overridable via AVC_XLA_CACHE_DIR).
    Returns the directory, or None if the running JAX lacks the knob."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("AVC_XLA_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".xla_cache",
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache_dir
