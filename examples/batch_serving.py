"""Throughput-mode serving walkthrough (capabilities beyond the reference).

Demonstrates batched multi-utterance synthesis and the dynamically-batching
HTTP server. Run with --synthetic for a structural demo without weights.
"""

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qwen3_tts_tpu import Qwen3TTS, SynthesisOptions
from qwen3_tts_tpu.models.config import config_for_variant
from qwen3_tts_tpu import server as srv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    # Throughput knobs (both opt-in): quantize_int8=True halves the weight
    # traffic the batched loop streams per frame; int8_activations=True
    # (w8a8) additionally feeds int8 x int8 MXU dots in batched programs —
    # faster still, but lossy (validate per checkpoint via
    # scripts/quant_report.py before enabling in production).
    if args.ckpt:
        model = Qwen3TTS.from_pretrained(args.ckpt)
    elif args.synthetic:
        model = Qwen3TTS.from_random(config_for_variant("0.6B", "custom_voice"))

        class Tok:
            def encode(self, text):
                return [37 + (hash(w) % 15000) for w in text.split()]

        model.tokenizer = Tok()
    else:
        raise SystemExit("pass --ckpt DIR or --synthetic")

    # --- 1. Direct batched API: B utterances through one vmapped loop ---
    texts = [
        "First customer request.",
        "Second request arriving at the same time.",
        "A third one, different speaker.",
    ]
    opts = SynthesisOptions(max_length=32, seed=42)
    t0 = time.perf_counter()
    audios = model.synthesize_batch(texts, ["ryan", "serena", "aiden"],
                                    "english", opts)
    wall = time.perf_counter() - t0
    total = sum(a.duration for a in audios)
    print(f"batched: {len(texts)} utterances, {total:.1f}s audio in {wall:.2f}s "
          f"(aggregate RTF {wall / max(total, 1e-9):.3f})")

    # --- 2. HTTP server with dynamic micro-batching ---
    http = srv.serve(model, port=0, max_batch=4, batch_window_ms=40)
    port = http.server_address[1]
    threading.Thread(target=http.serve_forever, daemon=True).start()
    print(f"server on :{port}")

    def request(i):
        payload = json.dumps(
            {"text": f"concurrent request {i}", "seed": i, "max_frames": 16}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/synthesize", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            wav = resp.read()
        print(f"  request {i}: {len(wav)} WAV bytes")

    threads = [threading.Thread(target=request, args=(i,)) for i in range(3)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(f"3 concurrent HTTP requests served in {time.perf_counter() - t0:.2f}s "
          "(coalesced into one batched TPU call)")
    http.shutdown()


if __name__ == "__main__":
    main()
