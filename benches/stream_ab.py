"""A/B the speculative streaming lookahead (journal R3.6) in one process.

Measures, at 1.7B int8 on the real device: non-streaming RTF, then
streaming RTF + TTFA with streaming_lookahead=0 (serial dispatch->fetch)
vs =1 (dispatch-ahead), plus the ICL-clone first-chunk latency both ways.
One process = same tunnel conditions, so the deltas are attributable.

Run: python benches/stream_ab.py [--size 1.7B] [--frames 135] [--iters 3]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--frames", type=int, default=135)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-int8", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from qwen3_tts_tpu import SynthesisOptions, tokens as T
    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS, VoiceClonePrompt

    cfg = config_for_variant(args.size, "custom_voice")
    model = Qwen3TTS.from_random(cfg)
    if not args.no_int8:
        model = Qwen3TTS(
            model.config, model.talker_params, model.cp_params,
            model.vocoder_params, model.tokenizer,
            vocoder_config=model.vocoder_config, quantize_int8=True,
        )

    class WordTokenizer:
        def encode(self, text):
            return [37 + (hash(w) % 15000) for w in text.split()]

    model.tokenizer = WordTokenizer()
    text = "The quick brown fox jumps over the lazy dog near the riverbank."
    frames = args.frames
    audio_s = frames * T.SAMPLES_PER_FRAME / T.OUTPUT_SAMPLE_RATE

    def opts(lookahead):
        return SynthesisOptions(
            max_length=frames, min_new_tokens=frames, seed=42,
            chunk_frames=10, streaming_lookahead=lookahead,
        )

    # Warmup: compile every program both paths use.
    for la in (0, 1):
        for _chunk in model.synthesize_streaming(text, "ryan", "english", opts(la)):
            pass
    model.synthesize_with_voice(text, "ryan", "english", opts(0))

    out = {}
    t = time.perf_counter()
    for _ in range(args.iters):
        model.synthesize_with_voice(text, "ryan", "english", opts(0))
    out["nonstream_rtf"] = (time.perf_counter() - t) / args.iters / audio_s

    for la in (0, 1):
        rtfs, ttfas = [], []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            ttfa = None
            for _chunk in model.synthesize_streaming(text, "ryan", "english", opts(la)):
                if ttfa is None:
                    ttfa = time.perf_counter() - t0
            rtfs.append((time.perf_counter() - t0) / audio_s)
            ttfas.append(ttfa * 1e3)
        out[f"stream_rtf_la{la}"] = statistics.mean(rtfs)
        out[f"stream_rtf_la{la}_min"] = min(rtfs)
        out[f"ttfa_la{la}"] = statistics.mean(ttfas)
        out[f"ttfa_la{la}_min"] = min(ttfas)

    # ICL clone first-chunk latency.
    rs = np.random.RandomState(0)
    ref = VoiceClonePrompt(
        speaker_embedding=rs.randn(model.config.talker.hidden_size).astype(np.float32),
        ref_codes=rs.randint(0, 2048, size=(38, 16)).astype(np.int32),
        ref_text_ids=[37 + (i * 53) % 15000 for i in range(12)],
    )
    for la in (0, 1):
        for _c in model.synthesize_voice_clone_streaming(text, ref, "english", opts(la)):
            pass  # warmup
        ttfas = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            for _c in model.synthesize_voice_clone_streaming(text, ref, "english", opts(la)):
                ttfas.append((time.perf_counter() - t0) * 1e3)
                break
        out[f"icl_ttfa_la{la}"] = statistics.mean(ttfas)
        out[f"icl_ttfa_la{la}_min"] = min(ttfas)

    for k, v in out.items():
        print(f"{k}: {v:.4f}" if "rtf" in k else f"{k}: {v:.1f}")


if __name__ == "__main__":
    main()
