"""Batched streaming throughput (journal R3.9) on the real device.

Measures, at real dims with pinned frame counts: aggregate streaming RTF
and first-chunk latency (TTFA) for B concurrent streams driven through
ONE fused program per chunk (Qwen3TTS.synthesize_streaming_batch), vs the
single-stream session at the same settings in the same process. The frame
loop is weight-bandwidth-bound, so aggregate RTF should scale near-B x.

Run: python benches/stream_batch_bench.py [--size 1.7B] [--frames 125]
     [--batches 1 2 4 8] [--iters 2] [--int8]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--chunk", type=int, default=10)
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
    # Production defaults: 4-frame first chunk (same as the single-stream
    # e2e bench), so batched TTFA is comparable to the solo-session TTFA.
    opts = SynthesisOptions(
        max_length=frames, min_new_tokens=frames, seed=42,
        chunk_frames=args.chunk, streaming_lookahead=1,
    )
    texts = [
        f"Stream number {i} of the batched streaming throughput benchmark."
        for i in range(max(args.batches))
    ]

    results = []
    for b in args.batches:
        def run():
            if b == 1:
                session = model.synthesize_streaming(
                    texts[0], "ryan", "english", opts
                )
                t0 = time.perf_counter()
                first = session.next_chunk()
                ttfa = time.perf_counter() - t0
                assert first is not None
                while session.next_chunk() is not None:
                    pass
            else:
                session = model.synthesize_streaming_batch(
                    texts[:b], options=opts
                )
                t0 = time.perf_counter()
                first = session.next_chunks()
                ttfa = time.perf_counter() - t0
                assert first is not None and all(c is not None for c in first)
                while session.next_chunks() is not None:
                    pass
            return time.perf_counter() - t0, ttfa

        run()  # warmup / compile
        walls, ttfas = [], []
        for _ in range(args.iters):
            wall, ttfa = run()
            walls.append(wall)
            ttfas.append(ttfa)
        wall = min(walls)
        rtf = wall / (b * audio_s)
        row = {
            "batch": b,
            "aggregate_rtf": round(rtf, 4),
            "wall_s": round(wall, 3),
            "ttfa_ms_min": round(min(ttfas) * 1e3, 1),
            "frames_per_s": round(b * frames / wall, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    base = results[0]["aggregate_rtf"]
    summary = {
        "size": args.size,
        "dtype": ("int8-w8a8" if args.w8a8 else "int8") if args.int8 else "bf16",
        "frames": frames,
        "chunk": args.chunk,
        "scaling_vs_batch1": [
            round(base / r["aggregate_rtf"], 2) for r in results
        ],
        "rows": results,
    }
    print(json.dumps(summary), flush=True)
    if args.json:
        Path(args.json).write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
