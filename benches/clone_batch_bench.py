"""Batched ICL voice-clone serving throughput (synthesize_batch with
VoiceClonePrompt streams).

Measures aggregate RTF at batch 1/2/4/8 for ICL clone requests — the
batched-clone serving path (VERDICT r4 #4): per-stream reference-code rows
ride the vmapped prefill at a shared bucket, the frame loop amortizes the
weight streaming across streams, and ONE bucketed vocoder pass decodes
[ref || generated] per stream with the proportional front cut
(src/lib.rs:1022-1044). Reference comparison: the reference engine has no
batching at all, and never streams its clone path (src/lib.rs:897-1046).

Walls include the reference-prefix vocoder cost (the honest clone serving
cost); RTF divides by GENERATED audio only.

Run: python benches/clone_batch_bench.py [--size 1.7B] [--frames 125]
     [--ref-frames 50] [--batches 1 2 4 8] [--iters 2] [--int8] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--frames", type=int, default=125)
    ap.add_argument("--ref-frames", type=int, default=50,
                    help="reference-audio codes per stream (50 = 4 s)")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from qwen3_tts_tpu import SynthesisOptions, tokens as T
    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS, VoiceClonePrompt

    cfg = config_for_variant(args.size, "custom_voice")
    model = Qwen3TTS.from_random(cfg)
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
    frames = args.frames
    audio_s = frames * T.SAMPLES_PER_FRAME / T.OUTPUT_SAMPLE_RATE
    # Text long enough that the ICL frame cap (6/token, src/lib.rs:915-929)
    # clears the requested budget: frames/6 + margin words.
    n_words = frames // 6 + 4
    opts = SynthesisOptions(max_length=frames, min_new_tokens=frames, seed=42)

    rs = np.random.RandomState(0)

    def make_prompt(i: int) -> VoiceClonePrompt:
        return VoiceClonePrompt(
            speaker_embedding=rs.randn(cfg.talker.hidden_size).astype(np.float32),
            ref_codes=rs.randint(0, 2048, size=(args.ref_frames, 16)).astype(np.int32),
            ref_text_ids=[int(x) for x in rs.randint(37, 15000, size=12)],
        )

    results = []
    for b in args.batches:
        texts = [
            " ".join(f"w{i}x{j}" for j in range(n_words)) for i in range(b)
        ]
        prompts = [make_prompt(i) for i in range(b)]
        model.synthesize_batch(texts, prompts, "english", opts)  # compile+warm
        walls = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            audios = model.synthesize_batch(texts, prompts, "english", opts)
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
        "mode": "int8" if args.int8 else "bf16",
        "frames": frames,
        "ref_frames": args.ref_frames,
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
