"""Persistent XLA compilation cache helper.

First compiles of the RCR graphs take minutes through the remote-compile
tunnel; the persistent cache makes every subsequent process start warm.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None,
                             min_compile_time_secs: float = 5.0) -> str:
    """Enable jax's persistent compilation cache. Returns the cache dir."""
    import jax

    if path is None:
        repo_cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
        path = os.environ.get("SDTPU_JAX_CACHE", repo_cache)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    return path
