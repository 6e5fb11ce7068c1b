"""Persistent XLA compilation cache (TPU backend only by default).

TPU compiles of the fused generation programs take tens of seconds; the
persistent cache makes every process after the first start in milliseconds.
Enabled by the pipeline on import (opt out with QWEN3_TTS_NO_COMPILE_CACHE=1).

CPU-backend entries are NOT persisted by default (opt in with
QWEN3_TTS_CPU_COMPILE_CACHE=1). Two reasons, both measured here:

* XLA:CPU records its own codegen *tuning* preferences (e.g.
  ``+prefer-no-gather``/``+prefer-no-scatter`` for gather-heavy programs —
  exactly our loop programs) as target machine features inside the AOT
  entry; the loader's host check only knows real cpuinfo features, so those
  entries are rejected on EVERY reload — even on the host that wrote them —
  after paying deserialization, with a page of ``cpu_aot_loader`` spam per
  program (VERDICT r4 #7). A host-ISA fingerprint in the cache key cannot
  fix a same-host reject.
* Foreign AOT machine code that *does* load can SIGILL on older hosts
  ("Machine type used for XLA:CPU compilation doesn't match ...").

TPU executables are target-keyed by the compiler itself, so the TPU cache
dir stays stable across hosts.
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
        # CPU AOT entries are same-host reject-on-reload (module docstring);
        # persisting them costs time + log spam for zero hits. Opt-in only.
        if not os.environ.get("QWEN3_TTS_CPU_COMPILE_CACHE"):
            return
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
