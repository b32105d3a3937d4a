"""Persistent compilation cache wiring (VERDICT r4 item 3)."""
import os

import jax

from vsearch_tpu.utils.compile_cache import enable_compilation_cache


def test_enable_sets_jax_config(tmp_path):
    d = tmp_path / "xla-cache"
    got = enable_compilation_cache(str(d))
    assert got == str(d)
    assert d.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(d)
    # thresholds set so serve's big Mosaic kernels persist
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0


def test_empty_string_disables(tmp_path, monkeypatch):
    monkeypatch.setenv("VSEARCH_TPU_COMPILE_CACHE", "")
    assert enable_compilation_cache() is None


def test_env_var_default(tmp_path, monkeypatch):
    d = tmp_path / "from-env"
    monkeypatch.setenv("VSEARCH_TPU_COMPILE_CACHE", str(d))
    assert enable_compilation_cache() == str(d)
    assert d.is_dir()


def test_unwritable_dir_degrades_gracefully(tmp_path, monkeypatch):
    # simulate a read-only fs (chmod can't stop root, which CI runs as):
    # cache setup must return None, not raise — serving comes up uncached
    from pathlib import Path

    def deny(self, *a, **kw):
        raise OSError(30, "Read-only file system")

    monkeypatch.setattr(Path, "mkdir", deny)
    assert enable_compilation_cache(str(tmp_path / "sub")) is None
