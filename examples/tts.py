"""API walkthrough (reference: examples/tts.rs).

Covers: loading, preset-speaker synthesis, options, timing, streaming,
voice design, and WAV output. Pass a checkpoint directory, or run with
--synthetic to exercise the API with random weights.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qwen3_tts_tpu import Qwen3TTS, SynthesisOptions
from qwen3_tts_tpu.models.config import config_for_variant


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out", default="example_out.wav")
    args = ap.parse_args()

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

    print(f"Loaded: {model.config.label}")
    print(f"  preset speakers: {model.supports_preset_speakers()}")
    print(f"  voice cloning:   {model.supports_voice_cloning()}")
    print(f"  voice design:    {model.supports_voice_design()}")

    # 1. Simple synthesis with defaults (Ryan, English).
    opts = SynthesisOptions(seed=42, max_length=64)
    audio, timing = model.synthesize_with_timing("Hello, world!", options=opts)
    print(
        f"synthesize: {audio.duration:.2f}s audio | prefill {timing.prefill_ms:.0f}ms "
        f"gen {timing.generation_ms:.0f}ms decode {timing.decode_ms:.0f}ms"
    )
    audio.save(args.out)
    print(f"wrote {args.out}")

    # 2. Custom sampling options + another speaker.
    audio = model.synthesize_with_voice(
        "Custom settings.",
        speaker="serena",
        language="chinese",
        options=SynthesisOptions(temperature=0.8, top_k=30, seed=7, max_length=64),
    )
    print(f"custom options: {audio.duration:.2f}s")

    # 3. Streaming.
    for i, chunk in enumerate(
        model.synthesize_streaming(
            "Streaming synthesis.", options=SynthesisOptions(seed=1, max_length=32, chunk_frames=8)
        )
    ):
        print(f"chunk {i}: {len(chunk) / chunk.sample_rate * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
