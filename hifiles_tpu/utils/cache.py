"""Persistent XLA compilation cache.

Compiles dominate wall time on small hosts (XLA's first compile in a fresh
process can take minutes on a single-core machine).  The persistent cache
makes solver reruns with unchanged shapes near-instant.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = path or os.environ.get("HIFILES_CACHE_DIR",
                                  os.path.expanduser("~/.hifiles_jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
