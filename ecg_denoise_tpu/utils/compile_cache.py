"""Persistent XLA compilation cache.

TPU compiles dominate wall-clock in this environment (8-26 min per model
through the remote-compile tunnel; epochs afterwards are ~0.1-4 s). JAX's
persistent compilation cache keys serialized executables by HLO hash, so a
re-run of the same train/eval program skips the compile entirely.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable jax's persistent compilation cache (idempotent)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "ECG_JAX_CACHE_DIR", os.path.expanduser("~/.cache/ecg_denoise_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything, however small/fast to compile.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
