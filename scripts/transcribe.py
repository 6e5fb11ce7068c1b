#!/usr/bin/env python
"""ASR transcription helper (reference: scripts/transcribe.py).

Transcribes WAVs for WER-style quality checks. Uses openai-whisper when
installed; otherwise falls back to any HF transformers ASR pipeline the
environment provides (e.g. whisper checkpoints), and explains what to
install if neither is available. This environment is air-gapped, so the
script is primarily for deployments with model access.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def transcribe_with_whisper(paths: list[Path], model_name: str) -> dict[str, str]:
    import whisper  # type: ignore[import-not-found]

    model = whisper.load_model(model_name)
    return {str(p): model.transcribe(str(p))["text"].strip() for p in paths}


def transcribe_with_transformers(paths: list[Path], model_name: str) -> dict[str, str]:
    from transformers import pipeline

    asr = pipeline("automatic-speech-recognition", model=model_name)
    out = {}
    for p in paths:
        out[str(p)] = asr(str(p))["text"].strip()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--model", default="base", help="whisper size or HF model id")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    files: list[Path] = []
    for p in map(Path, args.paths):
        files.extend(sorted(p.glob("**/*.wav")) if p.is_dir() else [p])

    try:
        results = transcribe_with_whisper(files, args.model)
    except ImportError:
        try:
            results = transcribe_with_transformers(
                files, args.model if "/" in args.model else f"openai/whisper-{args.model}"
            )
        except Exception as e:  # noqa: BLE001
            raise SystemExit(
                "No ASR backend available (pip install openai-whisper, or provide "
                f"a local HF whisper checkpoint): {e}"
            )

    if args.json:
        print(json.dumps(results, indent=2, ensure_ascii=False))
    else:
        for path, text in results.items():
            print(f"{path}: {text}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
