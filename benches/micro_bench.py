"""Micro-benchmarks (reference: benches/{sampling,audio,tensor_ops}.rs).

Times the host-side and per-frame ops in isolation: sampling pipeline
(top-k / top-p / penalties / suppression), mel spectrograms, resampling
(numpy vs native C++), and codes_to_tensor.

Run: python benches/micro_bench.py [--device cpu|tpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, iters=50, warmup=5):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def fmt(seconds: float) -> str:
    if seconds >= 1e-3:
        return f"{seconds * 1e3:.2f} ms"
    return f"{seconds * 1e6:.1f} µs"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu import native
    from qwen3_tts_tpu.audio import mel as mel_mod
    from qwen3_tts_tpu.audio import resample as rs_mod
    from qwen3_tts_tpu.ops import sampling

    print(f"device: {jax.devices()[0]}  native: {native.available()}")
    results = {}

    # --- sampling ops on [1, 3072] logits (the per-frame shapes) ---
    logits = jnp.asarray(np.random.RandomState(0).randn(1, 3072).astype(np.float32))
    cfg = sampling.SamplingConfig()
    supp = sampling.build_suppression_mask()
    pmask = jnp.zeros((3072,), jnp.float32)

    sample_fn = jax.jit(lambda lg: sampling.sample(lg, cfg, jnp.float32(0.5)))
    pen_fn = jax.jit(
        lambda lg: sampling.apply_generation_penalties(lg, pmask, supp, cfg, jnp.int32(5))
    )
    topk_fn = jax.jit(lambda lg: sampling.top_k_filter(lg, 50))
    topp_fn = jax.jit(lambda lg: sampling.top_p_filter(lg, 0.9))

    results["sample (fused top-k/top-p + multinomial)"] = timeit(
        lambda: jax.block_until_ready(sample_fn(logits))
    )
    results["penalties (rep + suppression + min-new)"] = timeit(
        lambda: jax.block_until_ready(pen_fn(logits))
    )
    results["top_k k=50"] = timeit(lambda: jax.block_until_ready(topk_fn(logits)))
    results["top_p 0.9"] = timeit(lambda: jax.block_until_ready(topp_fn(logits)))

    # --- mel spectrogram (speaker-encoder config) ---
    m = mel_mod.MelSpectrogram(mel_mod.speaker_encoder_config())
    for dur in (0.5, 2.0, 10.0):
        audio = np.sin(np.linspace(0, 1000 * dur, int(24000 * dur))).astype(np.float32)
        results[f"mel {dur}s"] = timeit(
            lambda a=audio: m.compute_for_speaker_encoder(a), iters=10
        )

    # --- resample 48k -> 24k ---
    for dur in (0.5, 2.0, 10.0):
        audio = np.sin(np.linspace(0, 1000 * dur, int(48000 * dur))).astype(np.float32)
        results[f"resample 48k->24k {dur}s"] = timeit(
            lambda a=audio: rs_mod.resample_array(a, 48000, 24000), iters=10
        )

    # --- codes_to_tensor ---
    for frames in (12, 60, 240):
        codes = np.random.RandomState(1).randint(0, 2048, (frames, 16)).astype(np.int32)
        results[f"codes_to_tensor {frames} frames"] = timeit(
            lambda c=codes: c.T[None].copy(), iters=200
        )

    width = max(len(k) for k in results)
    for k, v in results.items():
        print(f"{k:<{width}}  {fmt(v)}")


if __name__ == "__main__":
    main()
