"""Persistent-compile-cache policy (utils/compile_cache.py).

XLA:CPU AOT entries embed codegen tuning flags (+prefer-no-gather) that the
loader's host-feature check rejects on EVERY reload — even on the host that
wrote them — so CPU persistence is off by default (journal R5; VERDICT r4
#7). The TPU cache is the one that matters (reference analogue: none — the
reference recompiles per process; this is TPU-native infrastructure).
"""

from __future__ import annotations

import importlib

import pytest

from qwen3_tts_tpu.utils import compile_cache


@pytest.fixture()
def fresh_cc(monkeypatch):
    """Reload the module so the _enabled latch resets, and capture any
    jax.config updates instead of mutating the process config."""
    cc = importlib.reload(compile_cache)
    updates: dict = {}

    import jax

    monkeypatch.setattr(
        jax.config, "update", lambda k, v: updates.__setitem__(k, v)
    )
    yield cc, updates
    importlib.reload(compile_cache)


def test_cpu_platform_skips_persistence_by_default(
    fresh_cc, monkeypatch, tmp_path
):
    cc, updates = fresh_cc
    monkeypatch.delenv("QWEN3_TTS_CPU_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(cc, "_effective_platform", lambda: "cpu")
    cc.enable(str(tmp_path / "cache"))
    assert not cc._enabled
    assert "jax_compilation_cache_dir" not in updates
    assert not (tmp_path / "cache").exists()


def test_cpu_platform_opt_in(fresh_cc, monkeypatch, tmp_path):
    cc, updates = fresh_cc
    monkeypatch.setenv("QWEN3_TTS_CPU_COMPILE_CACHE", "1")
    monkeypatch.setattr(cc, "_effective_platform", lambda: "cpu")
    cc.enable(str(tmp_path / "cache"))
    assert cc._enabled
    # Host-ISA-fingerprinted subdir (foreign AOT code SIGILLs otherwise).
    assert updates["jax_compilation_cache_dir"].startswith(
        str(tmp_path / "cache") + "/cpu-"
    )


def test_tpu_platform_enables(fresh_cc, monkeypatch, tmp_path):
    cc, updates = fresh_cc
    monkeypatch.delenv("QWEN3_TTS_CPU_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(cc, "_effective_platform", lambda: "axon")
    cc.enable(str(tmp_path / "cache"))
    assert cc._enabled
    assert updates["jax_compilation_cache_dir"] == str(tmp_path / "cache")


def test_global_opt_out(fresh_cc, monkeypatch, tmp_path):
    cc, updates = fresh_cc
    monkeypatch.setenv("QWEN3_TTS_NO_COMPILE_CACHE", "1")
    monkeypatch.setattr(cc, "_effective_platform", lambda: "axon")
    cc.enable(str(tmp_path / "cache"))
    assert not cc._enabled
    assert not updates
