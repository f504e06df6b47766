"""Persistent compilation cache utility (utils/compile_cache.py).

TPU-relay measurement lives in tests/tpu_scripts/compile_cache_flagship.py
(49.3 s -> 13.5 s first serving call); here we verify the wiring on CPU:
enabling populates the directory, env-var disable is honored, and cached
programs produce identical results.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ssdseglib_tpu.utils.compile_cache import enable_compile_cache


def _restore(old):
    jax.config.update("jax_compilation_cache_dir", old[0])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old[1])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", old[2])


def _save():
    return (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
        jax.config.jax_persistent_cache_min_entry_size_bytes,
    )


def test_enable_populates_cache_and_results_match(tmp_path):
    old = _save()
    try:
        cache_dir = str(tmp_path / "jax_cache")
        used = enable_compile_cache(cache_dir)
        # an explicitly requested path is honored EXACTLY (ADVICE r4:
        # pre-warmed caches / external tooling keep seeing the entries);
        # only the default location gets the host-ISA subdirectory
        assert used == cache_dir
        assert os.path.isdir(used)

        def make():
            @jax.jit
            def f(x):
                return jnp.sin(x) @ x.T

            return f

        x = jnp.arange(12.0, dtype=jnp.float32).reshape(3, 4)
        expected = np.asarray(make()(x))
        assert len(os.listdir(cache_dir)) >= 1

        # a fresh identically-named jit must hit the cache (the key is the
        # HLO hash; no new entries) and return the same values
        n_entries = len(os.listdir(cache_dir))
        np.testing.assert_array_equal(np.asarray(make()(x)), expected)
        assert len(os.listdir(cache_dir)) == n_entries
    finally:
        _restore(old)


def test_env_var_controls_default(tmp_path, monkeypatch):
    old = _save()
    try:
        monkeypatch.setenv("SSDSEGLIB_COMPILE_CACHE", "off")
        assert enable_compile_cache() is None

        env_dir = str(tmp_path / "env_cache")
        monkeypatch.setenv("SSDSEGLIB_COMPILE_CACHE", env_dir)
        used = enable_compile_cache()
        # env-provided directories are explicit too: honored exactly
        assert used == env_dir and os.path.isdir(used)

        # explicit argument wins over a disabling env value
        monkeypatch.setenv("SSDSEGLIB_COMPILE_CACHE", "0")
        arg_dir = str(tmp_path / "arg_cache")
        assert enable_compile_cache(arg_dir) == arg_dir
    finally:
        _restore(old)


def test_default_location_is_host_scoped(monkeypatch, tmp_path):
    old = _save()
    try:
        monkeypatch.delenv("SSDSEGLIB_COMPILE_CACHE", raising=False)
        monkeypatch.setenv("HOME", str(tmp_path))
        import ssdseglib_tpu.utils.compile_cache as cc

        monkeypatch.setattr(
            cc, "_DEFAULT_DIR", str(tmp_path / "default_cache")
        )
        used = enable_compile_cache()
        # the DEFAULT location keeps the host-ISA subdirectory (XLA:CPU
        # entries are AOT executables compiled against the writing host's
        # CPU features; narrower hosts would SIGILL)
        assert os.path.basename(used).startswith("host-")
        assert used.startswith(str(tmp_path / "default_cache") + os.sep)
    finally:
        _restore(old)
