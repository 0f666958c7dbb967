"""Persistent XLA compilation cache (round-5, VERDICT-r4 #4).

Back-to-back large jit compiles over the axon tunnel take minutes and every
process pays them again (maxvit_t vanilla: >900 s; each twins_probe mode the
same) — the round-4 binding constraint on perf work. This helper turns on
jax's persistent compilation cache so a graph compiled once in any process is
a disk hit for every later process.

Fail-soft by design: if the backend's PJRT plugin cannot serialize
executables the cache config is a no-op (jax logs and falls through to a
normal compile), so it is always safe to call. Opt out with
``NRV_NO_COMPILE_CACHE=1``; override the location with
``NRV_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache. Idempotent.

    Returns the cache dir in use, or None when disabled via env.
    """
    global _enabled
    if os.environ.get("NRV_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("NRV_COMPILE_CACHE_DIR")
        or os.path.abspath(_DEFAULT_DIR)
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took real compile time; the tunnel makes even
    # medium graphs expensive, so the 1s floor is deliberate (default 1s
    # min-compile-time would skip nothing we care about, but make the
    # intent explicit and cache small entries too).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir
