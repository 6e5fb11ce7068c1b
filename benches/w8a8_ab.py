"""Same-session weight-only-int8 vs w8a8 batched-serving A/B.

Settles VERDICT r4 Weak #2: w8a8's motivation is removing the dequant-cast
VPU cost that keeps batched int8 decode at ~2x the weight-read bound
(journal R4.9) — but cross-session numbers (BENCH_batch_1p7b_int8.json
12.24 ms/frame vs BENCH_batch_1p7b_w8a8.json 12.38 at batch 8) are within
tunnel weather of each other. This harness measures both modes in ONE
process in an A-B-A pattern (int8, w8a8, int8 again) on the same quantized
model: if the two int8 phases agree, the weather was stable and the w8a8
delta is real; if they disagree, the session drifted.

The w8a8 switch is the facade's ``w8a8`` attribute — a static argument of
every batched jitted entry point, so flipping it selects a separate
compiled program (exactly what ``int8_activations=True`` at load time does)
without quantizing a second model tree.

Run: python benches/w8a8_ab.py [--size 1.7B] [--batches 1 8] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(model, texts, opts, iters, warmup=1):
    for _ in range(warmup):
        model.synthesize_batch(texts, "ryan", "english", opts)
    walls = []
    for _ in range(iters):
        t0 = time.perf_counter()
        audios = model.synthesize_batch(texts, "ryan", "english", opts)
        walls.append(time.perf_counter() - t0)
    total_audio = sum(len(a) for a in audios) / 24000.0
    wall = statistics.mean(walls)
    return {
        "wall_s": round(wall, 3),
        "wall_s_min": round(min(walls), 3),
        "aggregate_rtf": round(wall / total_audio, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--frames", type=int, default=125)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from qwen3_tts_tpu import SynthesisOptions
    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS

    cfg = config_for_variant(args.size, "custom_voice")
    base = Qwen3TTS.from_random(cfg)
    model = Qwen3TTS(
        base.config, base.talker_params, base.cp_params, base.vocoder_params,
        base.tokenizer, vocoder_config=base.vocoder_config,
        quantize_int8=True, int8_activations=True,
    )

    class WordTokenizer:
        def encode(self, text):
            return [37 + (hash(w) % 15000) for w in text.split()]

    model.tokenizer = WordTokenizer()
    opts = SynthesisOptions(
        max_length=args.frames, min_new_tokens=args.frames, seed=42
    )

    out = {"model": f"synthetic-{args.size}", "frames": args.frames, "rows": []}
    for b in args.batches:
        texts = [
            f"Utterance number {i} of the batched serving benchmark corpus."
            for i in range(b)
        ]
        row = {"batch": b}
        for phase, w8a8 in (("int8_a", False), ("w8a8", True), ("int8_b", False)):
            model.w8a8 = w8a8  # static jit arg: selects the compiled program
            row[phase] = measure(model, texts, opts, args.iters)
            print(f"batch {b} {phase}: {row[phase]}", file=sys.stderr)
        a, a2, bb = row["int8_a"], row["int8_b"], row["w8a8"]
        drift = abs(a["wall_s"] - a2["wall_s"]) / max(a["wall_s"], 1e-9)
        base_wall = (a["wall_s"] + a2["wall_s"]) / 2
        row["session_drift_pct"] = round(drift * 100, 1)
        row["w8a8_speedup_pct"] = round((base_wall - bb["wall_s"]) / base_wall * 100, 1)
        row["frame_ms_int8"] = round(base_wall / args.frames * 1e3, 2)
        row["frame_ms_w8a8"] = round(bb["wall_s"] / args.frames * 1e3, 2)
        out["rows"].append(row)

    print(json.dumps(out, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
