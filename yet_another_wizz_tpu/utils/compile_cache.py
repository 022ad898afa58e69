"""Persistent XLA compile-cache setup.

Remote/TPU compiles in this environment cost tens of seconds to minutes
per program, so every long-lived entry point (CLI pipeline, benchmarks,
hardware validation) routes through :func:`enable_persistent_compile_cache`.

The explicit ``jax.config.update`` API is used instead of only exporting
``JAX_COMPILATION_CACHE_DIR``: under the TPU plugin in use here the
env-var path can leave the cache uninitialized (reads log "cache is
disabled/not initialized" and nothing is ever written), while the config
API initializes it reliably in the same process.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_compile_cache"]


def enable_persistent_compile_cache(
    directory: str | None = None,
) -> str | None:
    """Enable jax's persistent compile cache at ``directory``.

    Falls back to ``JAX_COMPILATION_CACHE_DIR`` when no directory is
    given and leaves the cache untouched if neither is set. The entry
    size / minimum-compile-time thresholds honor their usual env
    overrides, with cache-everything defaults (-1 bytes / 0.5 s).
    Returns the directory in use, or None when left disabled.
    """
    directory = directory or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not directory:
        return None
    import jax

    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes",
        _env_number(
            "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", -1, int
        ),
    )
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        _env_number(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", 0.5, float
        ),
    )
    return directory


def _env_number(name, default, parse):
    """Env override with the default on empty/malformed values (a broken
    threshold must degrade the cache policy, not kill the entry point)."""
    raw = os.environ.get(name)
    if raw is None or raw.strip() == "":
        return default
    try:
        return parse(raw)
    except ValueError:
        return default
