"""Persistent XLA compilation cache.

TPU compiles of the fused generation programs take tens of seconds; the
persistent cache makes every process after the first start in milliseconds.
Enabled by the pipeline on import (opt out with QWEN3_TTS_NO_COMPILE_CACHE=1).
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = os.environ.get(
    "QWEN3_TTS_COMPILE_CACHE", str(Path.home() / ".cache" / "qwen3_tts_tpu" / "xla")
)
_enabled = False


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("QWEN3_TTS_NO_COMPILE_CACHE"):
        return
    import jax

    path = Path(cache_dir or _DEFAULT_DIR)
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
