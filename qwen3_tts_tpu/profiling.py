"""Profiling utilities: jax.profiler traces + host-transfer auditing.

TPU counterpart of the reference's tracing-chrome / NVTX setup
(src/profiling.rs, Makefile profile targets):

* ``trace(dir)`` captures an xprof/Perfetto-compatible trace of everything
  inside the context — open with TensorBoard's profile plugin or
  ui.perfetto.dev.
* ``annotate(name)`` adds a named region (TraceAnnotation) visible in traces.
* ``count_host_transfers()`` audits device->host syncs, the discipline the
  reference enforces with scripts/audit-gpu-syncs.sh: the generation loop
  must execute with zero transfers until the final frame fetch.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate("prefill"): ...``."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class TransferAudit:
    """Counts device_get calls while active (zero-sync-loop verification)."""

    transfers: int = 0
    _original: object = field(default=None, repr=False)

    def __enter__(self):
        self._original = jax.device_get

        def counting_device_get(x):
            self.transfers += 1
            return self._original(x)

        jax.device_get = counting_device_get
        return self

    def __exit__(self, *exc):
        jax.device_get = self._original
        return False


def count_host_transfers(fn, *args, **kwargs):
    """Run ``fn`` and return (result, number of jax.device_get calls)."""
    with TransferAudit() as audit:
        result = fn(*args, **kwargs)
    return result, audit.transfers
