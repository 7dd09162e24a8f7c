"""Persistent-compilation-cache helper (utils/compile_cache.py)."""

import os

from freegaussian_tpu.utils.compile_cache import enable_persistent_cache


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    import jax

    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("FREEGAUSSIAN_COMPILE_CACHE", str(tmp_path / "cache"))
    try:
        d = enable_persistent_cache()
        assert d == str(tmp_path / "cache")
        assert jax.config.jax_compilation_cache_dir == d
        # idempotent
        assert enable_persistent_cache() == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_opt_out(monkeypatch):
    monkeypatch.setenv("FREEGAUSSIAN_COMPILE_CACHE", "0")
    assert enable_persistent_cache() is None
