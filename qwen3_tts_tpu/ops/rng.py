"""Seeded RNG matching the reference's PCG-XSH-RR 64/32 stream.

The generation loop consumes exactly one uniform per sampled semantic token,
in order. Rather than emulating 64-bit integer arithmetic on-device (TPU JAX
runs with 32-bit default dtypes), we reproduce the PCG stream bit-exactly on
the host with numpy uint64 and hand the jitted generation loop a precomputed
``[max_draws]`` float32 array indexed by frame counter. This keeps the
while_loop body free of host syncs and of 64-bit ops while preserving the
exact uniform sequence of the reference (src/generation/sampling.rs:27-95).
"""

from __future__ import annotations

import time

import numpy as np

_PCG_MULT = np.uint64(6364136223846793005)
_PCG_INC = np.uint64(1442695040888963407)
_SEED_MIX_MULT = np.uint64(2685821657736338717)


def pcg_init_state(seed: int) -> np.uint64:
    """state = seed * 2685821657736338717 + 1442695040888963407 (mod 2^64)."""
    with np.errstate(over="ignore"):
        return np.uint64(seed) * _SEED_MIX_MULT + _PCG_INC


def pcg_next(state: np.uint64) -> tuple[np.uint64, np.uint32]:
    """One PCG-XSH-RR 64/32 step: returns (new_state, 32-bit output)."""
    old = np.uint64(state)
    with np.errstate(over="ignore"):
        new = old * _PCG_MULT + _PCG_INC
    xorshifted = np.uint32(((old >> np.uint64(18)) ^ old) >> np.uint64(27))
    rot = np.uint32(old >> np.uint64(59))
    # 32-bit rotate right by `rot`
    rot = rot & np.uint32(31)
    if rot == 0:
        out = xorshifted
    else:
        out = np.uint32(
            (int(xorshifted) >> int(rot)) | ((int(xorshifted) << (32 - int(rot))) & 0xFFFFFFFF)
        )
    return new, out


def pcg_uniform_sequence(seed: int, n: int) -> np.ndarray:
    """First ``n`` uniforms in [0, 1) of the seeded stream, float32.

    Matches rand_f32: ``(output as f32) / (u32::MAX as f32)``. Note that
    u32::MAX rounds to 2^32 in float32, so the divisor is 4294967296.0f.
    Dispatches to the native C++ kernel when built (bit-identical).
    """
    from .. import native

    fast = native.pcg_uniforms(seed, n)
    if fast is not None:
        return fast

    out = np.empty(n, dtype=np.float32)
    state = pcg_init_state(seed)
    for i in range(n):
        state, word = pcg_next(state)
        out[i] = np.float32(word) / np.float32(np.uint32(0xFFFFFFFF))
    return out


def unseeded_uniform_sequence(n: int) -> np.ndarray:
    """Non-deterministic uniforms for unseeded sessions.

    The reference's unseeded path derives values from the wall clock per draw
    (sampling.rs:66-81); determinism is explicitly not promised, so we simply
    use a time-seeded PCG stream here.
    """
    return pcg_uniform_sequence(time.time_ns() & 0xFFFFFFFFFFFFFFFF, n)
