"""Voice cloning walkthrough (reference: examples/voice_clone_generate.rs).

x-vector-only and ICL cloning from a reference WAV on a Base checkpoint.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qwen3_tts_tpu import AudioBuffer, Qwen3TTS, SynthesisOptions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="Base-variant checkpoint dir")
    ap.add_argument("--ref-audio", required=True)
    ap.add_argument("--ref-text", default=None, help="transcript -> ICL mode")
    ap.add_argument("--text", default="This is my cloned voice speaking.")
    ap.add_argument("--out", default="cloned.wav")
    args = ap.parse_args()

    model = Qwen3TTS.from_pretrained(args.ckpt)
    if not model.supports_voice_cloning():
        raise SystemExit(f"{model.config.label} has no speaker encoder; use a Base model")

    ref = AudioBuffer.load(args.ref_audio)
    print(f"reference: {ref.duration:.2f}s @ {ref.sample_rate} Hz")

    prompt = model.create_voice_clone_prompt(ref, args.ref_text)
    print(f"x-vector norm: {float((prompt.speaker_embedding ** 2).sum()) ** 0.5:.2f}")
    if prompt.ref_codes is not None:
        print(f"ICL: {prompt.ref_codes.shape[0]} reference frames")

    audio = model.synthesize_voice_clone(
        args.text, prompt, options=SynthesisOptions(seed=42)
    )
    audio.save(args.out)
    print(f"wrote {args.out} ({audio.duration:.2f}s)")


if __name__ == "__main__":
    main()
