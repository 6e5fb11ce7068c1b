"""Same-session bf16 vs int8 ICL voice-clone streaming A/B.

Diagnoses VERDICT r3 Weak #2: the int8 e2e artifact recorded ICL clone TTFA
517 ms mean / 367 ms min vs bf16's 138 ms — either a real regression on the
int8 ICL path or a tunnel-weather artifact from measuring the two modes in
different sessions. This harness measures both modes in ONE process in an
A-B-A pattern (bf16, int8, bf16 again): if the two bf16 phases agree, the
weather was stable and the int8 delta is real; if they disagree, the
session itself drifted.

Run: python benches/icl_ab.py [--size 1.7B] [--iters 5] [--frames 65]
"""

from __future__ import annotations

import argparse
import gc
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure_icl(model, opts, clone_prompt, text, iters, warmup=2):
    ttfas, rtfs = [], []
    for _ in range(warmup):
        for _chunk in model.synthesize_voice_clone_streaming(
            text, clone_prompt, "english", opts
        ):
            pass
    for _ in range(iters):
        t0 = time.perf_counter()
        session = model.synthesize_voice_clone_streaming(
            text, clone_prompt, "english", opts
        )
        total, ttfa = 0, None
        for chunk in session:
            if ttfa is None:
                ttfa = time.perf_counter() - t0
            total += len(chunk)
        wall = time.perf_counter() - t0
        ttfas.append(ttfa * 1e3)
        rtfs.append(wall / (total / 24000.0))
    return {
        "ttfa_ms": round(statistics.mean(ttfas), 1),
        "ttfa_ms_min": round(min(ttfas), 1),
        "streaming_rtf": round(statistics.mean(rtfs), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--frames", type=int, default=65)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import numpy as np

    from qwen3_tts_tpu import SynthesisOptions
    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS, VoiceClonePrompt

    cfg = config_for_variant(args.size, "custom_voice")
    base = Qwen3TTS.from_random(cfg)

    class WordTokenizer:
        def encode(self, text):
            return [37 + (hash(w) % 15000) for w in text.split()]

    base.tokenizer = WordTokenizer()

    rs = np.random.RandomState(0)
    clone_prompt = VoiceClonePrompt(
        speaker_embedding=rs.randn(cfg.talker.hidden_size).astype(np.float32),
        ref_codes=rs.randint(0, 2048, size=(38, 16)).astype(np.int32),
        ref_text_ids=[37 + (i * 53) % 15000 for i in range(12)],
    )
    text = "The quick brown fox jumps over the lazy dog near the river bank."
    opts = SynthesisOptions(
        max_length=args.frames, min_new_tokens=args.frames, seed=42,
        chunk_frames=10, repetition_penalty=1.5,
    )

    out = {"size": args.size, "iters": args.iters}
    out["bf16_a"] = measure_icl(base, opts, clone_prompt, text, args.iters)
    print(f"bf16 (A): {out['bf16_a']}", file=sys.stderr)

    m8 = Qwen3TTS(
        base.config, base.talker_params, base.cp_params, base.vocoder_params,
        base.tokenizer, vocoder_config=base.vocoder_config, quantize_int8=True,
    )
    out["int8"] = measure_icl(m8, opts, clone_prompt, text, args.iters)
    print(f"int8:     {out['int8']}", file=sys.stderr)
    del m8
    gc.collect()

    out["bf16_b"] = measure_icl(base, opts, clone_prompt, text, args.iters)
    print(f"bf16 (B): {out['bf16_b']}", file=sys.stderr)

    drift = abs(out["bf16_a"]["ttfa_ms_min"] - out["bf16_b"]["ttfa_ms_min"])
    out["bf16_phase_drift_ms"] = round(drift, 1)
    out["int8_minus_bf16_min_ms"] = round(
        out["int8"]["ttfa_ms_min"]
        - (out["bf16_a"]["ttfa_ms_min"] + out["bf16_b"]["ttfa_ms_min"]) / 2,
        1,
    )
    print(json.dumps(out, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
