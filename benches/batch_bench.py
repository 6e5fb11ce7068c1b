"""Non-streaming batched-serving throughput (Qwen3TTS.synthesize_batch).

Measures aggregate RTF at batch 1/2/4/8 — the docs/BENCHMARKS.md batched
serving table — in bf16 or int8 (--int8: the vmapped loop uses the XLA
dequant-then-dot path; the batch-1 whole-step kernels don't vmap, so the
int8 win here is pure HBM-bytes halving). Reference comparison: the
reference engine is strictly batch-1 (src/lib.rs:169-172).

Run: python benches/batch_bench.py [--size 1.7B] [--frames 125]
     [--batches 1 2 4 8] [--iters 2] [--int8] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--frames", type=int, default=125)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--w8a8", action="store_true",
                    help="with --int8: int8 activations (int8 x int8 MXU dots)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from qwen3_tts_tpu import SynthesisOptions, tokens as T
    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS

    cfg = config_for_variant(args.size, "custom_voice")
    model = Qwen3TTS.from_random(cfg)
    if args.int8:
        model = Qwen3TTS(
            model.config, model.talker_params, model.cp_params,
            model.vocoder_params, model.tokenizer,
            vocoder_config=model.vocoder_config, quantize_int8=True,
            int8_activations=args.w8a8,
        )

    class WordTokenizer:
        def encode(self, text):
            return [37 + (hash(w) % 15000) for w in text.split()]

    model.tokenizer = WordTokenizer()
    frames = args.frames
    audio_s = frames * T.SAMPLES_PER_FRAME / T.OUTPUT_SAMPLE_RATE
    opts = SynthesisOptions(max_length=frames, min_new_tokens=frames, seed=42)

    results = []
    for b in args.batches:
        texts = [
            f"Utterance number {i} of the batched serving benchmark corpus."
            for i in range(b)
        ]
        model.synthesize_batch(texts, "ryan", "english", opts)  # compile+warm
        walls = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            audios = model.synthesize_batch(texts, "ryan", "english", opts)
            walls.append(time.perf_counter() - t0)
        total_audio = sum(len(a) for a in audios) / T.OUTPUT_SAMPLE_RATE
        wall = statistics.mean(walls)
        row = {
            "batch": b,
            "wall_s": round(wall, 3),
            "rtf_per_stream": round(wall / audio_s, 4),
            "aggregate_rtf": round(wall / total_audio, 4),
            "frame_ms_batch": round(wall / frames * 1e3, 2),
        }
        results.append(row)
        print(f"batch {b}: {row}", file=sys.stderr)

    base = results[0]["aggregate_rtf"]
    summary = {
        "model": f"synthetic-{args.size}",
        "mode": ("int8-w8a8" if args.w8a8 else "int8") if args.int8 else "bf16",
        "frames": frames,
        "rows": results,
        "scaling_vs_batch1": [
            round(base / r["aggregate_rtf"], 2) for r in results
        ],
    }
    print(json.dumps(summary, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
