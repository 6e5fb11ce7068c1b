"""Decompose streaming TTFA into phases, per corpus length.

Diagnoses VERDICT r3 Weak #3 (TTFA grows with utterance length: the
reference's TTFA is length-independent, /root/reference/docs/BENCHMARKS.md:81).
First-chunk work should not depend on total text length; this bench times
each phase of the first chunk separately so the scaling term is attributable:

  tokenize   host tokenization + padding
  prefill    session creation through prefill completion (blocked)
  vstate     streaming-vocoder state init (blocked)
  dispatch1  first fused advance+decode enqueue (async)
  dispatch2  lookahead steady-chunk enqueue (async)
  fetch1     first chunk device_get (the remaining device+transfer time)

Run:  python benches/ttfa_decompose.py [--size 1.7B] [--int8] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

PHASES = ("tokenize", "prefill", "vstate", "dispatch1", "dispatch2", "fetch1", "ttfa")


def measure(model, text: str, sopts, iters: int) -> dict:
    """Phase-timed first chunks for one (model, text, options) combo.

    Replicates next_chunk()'s first-chunk sequence (first_chunk_frames
    dispatch, one lookahead dispatch, fetch) with timing barriers between
    phases. Warmup is the caller's job.
    """
    import jax

    phases = {k: [] for k in PHASES}
    for _ in range(iters):
        t0 = time.perf_counter()
        ids = model._encode_text(text)
        model._pad_ids(ids)
        t_tok = time.perf_counter()

        session = model.synthesize_streaming(text, "ryan", "english", sopts)
        jax.block_until_ready(session.state.last_hidden)
        t_prefill = time.perf_counter()

        chunk = max(min(sopts.first_chunk_frames or sopts.chunk_frames,
                        sopts.chunk_frames), 1)
        session._ensure_vstate(0)
        jax.block_until_ready(session.vstate.kv_k)
        t_vstate = time.perf_counter()

        target = min(chunk, sopts.max_length)
        wav_dev, n_dev, done_dev = session._dispatch_chunk_exact(
            target, 0, chunk)
        session._pending.append((0, chunk, wav_dev, n_dev, done_dev))
        session._spec_frontier = target
        t_d1 = time.perf_counter()

        session._dispatch_exact_ahead(sopts.chunk_frames)
        t_d2 = time.perf_counter()

        e0, csz, w, nd, dd = session._pending.pop(0)
        jax.device_get((w, nd, dd))
        t_fetch = time.perf_counter()

        phases["tokenize"].append(t_tok - t0)
        phases["prefill"].append(t_prefill - t_tok)
        phases["vstate"].append(t_vstate - t_prefill)
        phases["dispatch1"].append(t_d1 - t_vstate)
        phases["dispatch2"].append(t_d2 - t_d1)
        phases["fetch1"].append(t_fetch - t_d2)
        phases["ttfa"].append(t_fetch - t_tok)
        # Drain so donated buffers aren't left in flight.
        while session.next_chunk() is not None:
            pass

    row = {
        k: {
            "min_ms": round(min(v) * 1e3, 2),
            "mean_ms": round(statistics.mean(v) * 1e3, 2),
        }
        for k, v in phases.items()
    }
    s = model.synthesize_streaming(text, "ryan", "english", sopts)
    row["shapes"] = {
        "max_length": sopts.max_length,
        "text_bucket": int(model._pad_ids(model._encode_text(text))[0].shape[0]),
        "initial_frames": int(s.state.frames.shape[0]),
        "cache_rows": int(s.state.cache.k.shape[2]),
        "uniforms": int(s.uniforms.shape[0]),
    }
    del s
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunk-frames", type=int, default=10)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from e2e_bench import CORPUS, PINNED_FRAMES

    from qwen3_tts_tpu import SynthesisOptions
    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS

    model = Qwen3TTS.from_random(config_for_variant(args.size, "custom_voice"))
    if args.int8:
        model = Qwen3TTS(
            model.config, model.talker_params, model.cp_params,
            model.vocoder_params, model.tokenizer,
            vocoder_config=model.vocoder_config, quantize_int8=True,
        )

    class WordTokenizer:
        def encode(self, text):
            return [37 + (hash(w) % 15000) for w in text.split()]

    model.tokenizer = WordTokenizer()

    results = {}
    for name, text in CORPUS.items():
        frames = PINNED_FRAMES[name]
        sopts = SynthesisOptions(
            max_length=frames, min_new_tokens=frames, seed=42,
            chunk_frames=args.chunk_frames,
        )
        # Warmup: compile every program the first chunk touches.
        for _ in range(2):
            s = model.synthesize_streaming(text, "ryan", "english", sopts)
            while s.next_chunk() is not None:
                pass
        results[name] = measure(model, text, sopts, args.iters)
        print(f"{name}: {json.dumps(results[name])}", file=sys.stderr, flush=True)

    print(json.dumps(results, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
