"""Persistent XLA compilation cache (verified working on the axon TPU tunnel).

Remote TPU compiles take minutes for the full model and the CPU compile of the
512-squared sharded train step dominates the multichip dryrun's wall clock on
this 1-core host; the on-disk cache makes repeat invocations (driver re-runs,
bench sweeps, test sessions) near-instant for unchanged programs. Cache entries
are keyed by program + compile options + backend, so CPU/TPU runs coexist in
one directory.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's compilation cache at `path` (default: <repo>/.jax_cache, or
    $JAX_COMPILATION_CACHE_DIR when set). Returns the directory, or None when
    the cache could not be enabled (old jaxlib, unwritable dir) — callers
    proceed uncached either way."""
    import jax

    d = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".jax_cache",
    )
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # Default gate is 1s; keep small programs out but cache everything
        # that actually costs wall clock.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return d
    except Exception:
        return None
