"""Persistent compile-cache wiring (utils/compile_cache.py).

The cache itself is validated on-chip by scripts/exp_compile_cache.py
(BENCH_compile_cache.json: cold 11.57 s -> warm 1.49 s); these tests
pin the resolution/enable semantics the serving CLIs rely on.
"""

import os

import jax
import pytest

from emr2a_tpu.utils import compile_cache as cc


def test_noop_when_unset(monkeypatch):
    monkeypatch.delenv(cc.ENV_VAR, raising=False)
    assert cc.enable_compile_cache(None) is None


def test_explicit_dir_wins_and_configures(tmp_path, monkeypatch):
    monkeypatch.setenv(cc.ENV_VAR, str(tmp_path / "from_env"))
    target = tmp_path / "explicit"
    resolved = cc.enable_compile_cache(str(target))
    assert resolved == str(target)
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)
    # thresholds zeroed so small per-bucket prefill programs persist too
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0


def test_env_var_fallback(tmp_path, monkeypatch):
    envdir = tmp_path / "envcache"
    monkeypatch.setenv(cc.ENV_VAR, str(envdir))
    assert cc.enable_compile_cache(None) == str(envdir)
    assert envdir.is_dir()


def test_cache_round_trip_on_cpu(tmp_path):
    """A jitted program lands at least one serialized entry in the dir."""
    cc.enable_compile_cache(str(tmp_path / "rt"))
    try:
        import jax.numpy as jnp

        @jax.jit
        def f(x):
            return (x * 2.0 + 1.0).sum()

        f(jnp.arange(64, dtype=jnp.float32)).block_until_ready()
        entries = os.listdir(str(tmp_path / "rt"))
        assert entries, "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        cc._enabled_dir = None


def test_cli_flag_present():
    import argparse

    p = argparse.ArgumentParser()
    cc.add_compile_cache_arg(p)
    args = p.parse_args(["--compile_cache", "/tmp/x"])
    assert args.compile_cache == "/tmp/x"
    assert p.parse_args([]).compile_cache is None
