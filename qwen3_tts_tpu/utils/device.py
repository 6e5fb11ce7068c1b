"""Device helpers (reference: src/lib.rs auto_device / parse_device /
device_info / sync_device, re-expressed for JAX backends)."""

from __future__ import annotations

import jax


def auto_device():
    """Best available device: TPU plugin if present, else CPU."""
    return jax.devices()[0]


def parse_device(spec: str):
    """Resolve "auto" | "cpu" | "tpu" | "tpu:N" to a jax Device."""
    spec = spec.strip().lower()
    if spec == "auto":
        return auto_device()
    if spec == "cpu":
        cpus = [d for d in jax.devices("cpu")]
        if not cpus:
            raise ValueError("no CPU devices available")
        return cpus[0]
    if spec.startswith("tpu"):
        tpus = [d for d in jax.devices() if d.platform != "cpu"]
        if not tpus:
            raise ValueError("no accelerator devices available (TPU plugin not loaded)")
        idx = int(spec.split(":", 1)[1]) if ":" in spec else 0
        return tpus[idx]
    raise ValueError(f"unknown device '{spec}'. Supported: auto, cpu, tpu, tpu:N")


def device_info(device=None) -> str:
    device = device or auto_device()
    return f"{device.platform}:{device.id} ({device.device_kind})"


def sync_device(x=None) -> None:
    """Block until pending device work completes (timing boundaries)."""
    if x is not None:
        jax.block_until_ready(x)
    else:
        jax.block_until_ready(jax.numpy.zeros(()))
