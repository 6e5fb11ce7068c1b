#!/usr/bin/env python
"""Serving-config parity matrix over a loaded checkpoint (VERDICT r4 #5).

Drills every serving configuration the server can run — {solo, mesh} x
{bf16, int8, int8+w8a8} — through ``Qwen3TTS.from_pretrained`` on one
checkpoint, asserting the cross-placement invariants that
tests/test_parallel.py proves for in-memory random models, but here through
the full checkpoint-loading path (weight maps, sidecar configs, quantized
re-layouts, tp packs).

Two tiers per column, matching what tests/test_parallel.py proves:

  * PRODUCTION tier (bf16 policy, temperature 0.9): every cell must
    produce valid audio (finite, non-empty) — exercises the exact serving
    configuration users run, through the checkpoint path.
  * CROSS-PLACEMENT tier (dtype=f32, greedy temperature 0.001): mesh
    frames == solo frames exactly and audio |delta| <= 1e-5. GSPMD
    row-parallel matmuls psum partial products across tp chips, so logits
    carry reduction-order noise; under bf16 with RANDOM weights (the
    synthetic drill checkpoint) top-2 logit gaps sit inside that noise
    band and argmax flips — f32+greedy is the placement-stable regime the
    test suite pins (tests/test_parallel.py:152-155), and it still drives
    every sharded program through the full checkpoint-loading path. On a
    REAL checkpoint greedy gaps are wide; compare bf16 placements with
    scripts/quant_report.py (logit drift), not bit equality.

Runs on the virtual CPU mesh (dp=2 x tp=2 over 4 host devices) so
checkpoint-landing day validates the sharded serving configs too, not just
solo bf16/int8. Part of ``make parity`` / ``make parity-drill``.

Usage: python scripts/parity_matrix.py --model-dir CKPT [--frames 12]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

# Virtual multi-device CPU mesh; must precede the first jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--text", default="parity matrix drill")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from qwen3_tts_tpu import SynthesisOptions
    from qwen3_tts_tpu.parallel import sharding as S
    from qwen3_tts_tpu.pipeline import Qwen3TTS

    import jax.numpy as jnp

    mesh = S.make_mesh(jax.devices()[:4], tp=2)  # dp=2 x tp=2
    # Production sampling config: per-cell validity.
    opts = SynthesisOptions(
        max_length=args.frames, min_new_tokens=args.frames, seed=42
    )
    # Greedy: the placement-stable decode for cross-placement equality
    # (see module docstring).
    greedy = SynthesisOptions(
        max_length=args.frames, min_new_tokens=args.frames, seed=42,
        temperature=0.001,
    )
    texts = [args.text, args.text + " second stream"]
    t_start = time.monotonic()
    n_cells = 0

    def ok(name: str) -> None:
        nonlocal n_cells
        n_cells += 1
        print(f"  [ok] {name} (elapsed {time.monotonic() - t_start:.0f}s)",
              flush=True)

    def load(mesh_arg=None, int8=False, w8a8=False, dtype=jnp.bfloat16):
        # One model in device memory at a time (caller deletes between
        # cells); each load exercises the full checkpoint path for that
        # serving config.
        return Qwen3TTS.from_pretrained(
            args.model_dir, mesh=mesh_arg, quantize_int8=int8,
            int8_activations=w8a8, dtype=dtype,
        )

    def frames_and_audio(m):
        s = m._custom_voice_session(texts[0], "ryan", "english", greedy)
        frames = np.asarray(s.run_to_completion())
        return frames, np.asarray(m.decode_codes(frames).samples)

    def cell(int8: bool, mesh_arg=None):
        """Production-tier validity + f32-greedy frames/audio for the config."""
        m = load(mesh_arg=mesh_arg, int8=int8)
        a = m.synthesize_with_voice(texts[0], "ryan", "english", opts)
        assert np.isfinite(a.samples).all() and len(a) > 0
        del m
        return frames_and_audio(load(mesh_arg=mesh_arg, int8=int8,
                                     dtype=jnp.float32))

    print("parity matrix: {solo, mesh} x {bf16, int8, w8a8}", flush=True)

    f_solo, a_solo = cell(int8=False)
    ok("bf16 solo")
    f_mesh, a_mesh = cell(int8=False, mesh_arg=mesh)
    np.testing.assert_array_equal(f_mesh, f_solo)
    np.testing.assert_allclose(a_mesh, a_solo, rtol=0, atol=1e-5)
    ok("bf16 mesh == solo (f32 greedy frames; audio atol 1e-5)")

    f8_solo, a8_solo = cell(int8=True)
    ok("int8 solo")
    f8_mesh, a8_mesh = cell(int8=True, mesh_arg=mesh)
    np.testing.assert_array_equal(f8_mesh, f8_solo)
    np.testing.assert_allclose(a8_mesh, a8_solo, rtol=0, atol=1e-5)
    ok("int8 mesh == solo (f32 greedy frames; audio atol 1e-5)")

    # w8a8 engages in batched programs only (solo decode stays weight-only).
    def w8a8_cell(mesh_arg=None):
        m = load(mesh_arg=mesh_arg, int8=True, w8a8=True)
        b_val = m.synthesize_batch(texts, "ryan", "english", opts)
        assert all(np.isfinite(a.samples).all() and len(a) > 0 for a in b_val)
        del m
        m = load(mesh_arg=mesh_arg, int8=True, w8a8=True, dtype=jnp.float32)
        return m.synthesize_batch(texts, "ryan", "english", greedy)

    b_solo = w8a8_cell()
    ok("w8a8 batch solo")
    b_mesh = w8a8_cell(mesh_arg=mesh)
    for got, want in zip(b_mesh, b_solo):
        np.testing.assert_allclose(
            got.samples, want.samples, rtol=0, atol=1e-5
        )
    ok("w8a8 batch mesh == solo (f32 greedy, atol 1e-5)")

    print(
        f"parity matrix OK: {n_cells}/6 cells green in "
        f"{time.monotonic() - t_start:.0f}s"
    )


if __name__ == "__main__":
    main()
