#!/usr/bin/env python
"""Compile-cache warmer for production cold-start.

Pre-compiles every XLA program a serving deployment will hit — prefill
buckets, frame-budget buckets, streaming chunk programs, vocoder decode
buckets, and (optionally) batch sizes — into the persistent compilation
cache so the first real request is served at steady-state latency.

Run once per machine/image:
    python scripts/warmup.py --ckpt DIR [--batches 1 2 4 8] \
        [--frame-buckets 128 512 2048]
Without --ckpt, warms with synthetic weights at the chosen size (the cache
keys on program shapes, not weight values, so this still warms real serving
as long as dimensions match).
"""

from __future__ import annotations

import argparse
import itertools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--frame-buckets", type=int, nargs="+", default=[128, 512, 2048])
    ap.add_argument("--batches", type=int, nargs="+", default=[1])
    ap.add_argument("--chunk-frames", type=int, default=10)
    args = ap.parse_args()

    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS, SynthesisOptions

    if args.ckpt:
        model = Qwen3TTS.from_pretrained(args.ckpt)
    else:
        model = Qwen3TTS.from_random(config_for_variant(args.size, "custom_voice"))

        class Tok:
            def encode(self, text):
                return [37 + (hash(w) % 15000) for w in text.split()]

        model.tokenizer = Tok()

    text = "warmup utterance covering the standard prompt bucket size"
    for frames, batch in itertools.product(args.frame_buckets, args.batches):
        opts = SynthesisOptions(max_length=frames, min_new_tokens=2, seed=0,
                                chunk_frames=args.chunk_frames)
        t0 = time.perf_counter()
        if batch == 1:
            # non-streaming + streaming programs
            model.synthesize_with_voice(text, "ryan", "english", opts)
            for _ in model.synthesize_streaming(text, "ryan", "english", opts):
                pass
        else:
            model.synthesize_batch([text] * batch, options=opts)
        print(f"warmed frames={frames} batch={batch} in {time.perf_counter()-t0:.1f}s",
              flush=True)
    print("compile cache is hot")


if __name__ == "__main__":
    main()
