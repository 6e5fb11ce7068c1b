"""Compare speaker embeddings across reference clips
(reference: examples/compare_speaker_embeddings.rs).

Cosine similarity between x-vectors should be high for the same speaker and
lower across speakers.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qwen3_tts_tpu import AudioBuffer, Qwen3TTS, resample_to_24k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="Base-variant checkpoint dir")
    ap.add_argument("wavs", nargs="+", help="two or more reference WAVs")
    args = ap.parse_args()

    model = Qwen3TTS.from_pretrained(args.ckpt)
    if model.speaker_encoder is None:
        raise SystemExit("checkpoint has no speaker encoder (need a Base model)")

    embeddings = {}
    for path in args.wavs:
        audio = AudioBuffer.load(path)
        if audio.sample_rate != 24000:
            audio = resample_to_24k(audio)
        emb = model.speaker_encoder.encode(audio.samples)
        embeddings[path] = emb
        print(f"{path}: norm {np.linalg.norm(emb):.2f}")

    paths = list(embeddings)
    for i in range(len(paths)):
        for j in range(i + 1, len(paths)):
            a, b = embeddings[paths[i]], embeddings[paths[j]]
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
            print(f"cos({Path(paths[i]).name}, {Path(paths[j]).name}) = {cos:.4f}")


if __name__ == "__main__":
    main()
