"""Unit test for utils/compile_cache.py — the persistent-cache switch every
CLI flips (TPU cold compiles here are 2-26 min; the cache makes repeats
near-instant, CLAUDE.md environment notes)."""

import jax

from ecg_denoise_tpu.utils.compile_cache import enable_compilation_cache


def test_enable_compilation_cache_sets_config(tmp_path):
    cache_dir = str(tmp_path / "jax_cache")
    got = enable_compilation_cache(cache_dir)
    assert got == cache_dir
    import os

    assert os.path.isdir(cache_dir)
    assert jax.config.jax_compilation_cache_dir == cache_dir
    # Cache-everything thresholds (tiny fused programs still matter through
    # the tunnel).
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
    # Idempotent re-call with the env-var default path.
    import os as _os

    _os.environ["ECG_JAX_CACHE_DIR"] = cache_dir
    try:
        assert enable_compilation_cache() == cache_dir
    finally:
        del _os.environ["ECG_JAX_CACHE_DIR"]
