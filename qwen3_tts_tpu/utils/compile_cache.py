"""Persistent XLA compilation cache.

TPU compiles of the fused generation programs take tens of seconds; the
persistent cache makes every process after the first start in milliseconds.
Enabled by the pipeline on import (opt out with QWEN3_TTS_NO_COMPILE_CACHE=1).

CPU-backend entries are keyed by a host-CPU fingerprint: XLA:CPU persists
AOT machine code compiled for the *build* host's ISA features and will load
it on a different host anyway ("Machine type used for XLA:CPU compilation
doesn't match ... could lead to execution errors such as SIGILL") — on a
VM fleet with heterogeneous CPU generations that turns a warm cache into a
SIGILL/abort at dispatch time. TPU executables are target-keyed by the
compiler itself, so the TPU cache dir stays stable across hosts.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

_DEFAULT_DIR = os.environ.get(
    "QWEN3_TTS_COMPILE_CACHE", str(Path.home() / ".cache" / "qwen3_tts_tpu" / "xla")
)
_enabled = False


def _host_cpu_fingerprint() -> str:
    """Stable short hash of the host CPU's ISA feature set."""
    try:
        text = Path("/proc/cpuinfo").read_text()
        for line in text.splitlines():
            if line.startswith(("flags", "Features")):
                feats = " ".join(sorted(line.split(":", 1)[1].split()))
                return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def _effective_platform() -> str:
    """The platform jax will resolve, WITHOUT initializing the backend."""
    import jax

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    return (plats.split(",")[0] if plats else "").strip().lower()


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("QWEN3_TTS_NO_COMPILE_CACHE"):
        return
    import jax

    path = Path(cache_dir or _DEFAULT_DIR)
    if _effective_platform() in ("", "cpu"):
        # "" = auto-detect: may resolve to CPU, so isolate per host anyway.
        path = path / f"cpu-{_host_cpu_fingerprint()}"
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
