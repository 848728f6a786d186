"""Persistent XLA compilation cache helper.

First compiles of the RCR graphs take minutes through the remote-compile
tunnel; the persistent cache makes every subsequent process start warm.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None,
                             min_compile_time_secs: float = 5.0) -> str:
    """Enable jax's persistent compilation cache. Returns the cache dir.

    Also drops Python-traceback source locations from lowered modules:
    jax's cache key strips debug info from the OUTER module only, while
    a Pallas kernel rides inside the custom-call payload with its
    Mosaic module's location strings intact — measured (round 5): the
    canonicalised IR of the fused serving kernel embedded the CALLER's
    file path and call-site lines, so ANY line-shifting edit to bench.py
    / models/rcr.py / an app invalidated every fused-kernel cache entry
    and forced minutes of recompiles per run. With tracebacks excluded
    from locations the canonical bytes are identical across call sites
    (verified byte-for-byte); only edits to the kernel file itself still
    re-key its entries. Cost: compiler error messages lose Python frame
    attribution — acceptable for cached serving/bench flows.
    """
    import jax

    if path is None:
        repo_cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
        path = os.environ.get("SDTPU_JAX_CACHE", repo_cache)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    jax.config.update("jax_traceback_in_locations_limit", 0)
    return path
