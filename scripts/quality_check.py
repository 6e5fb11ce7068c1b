#!/usr/bin/env python
"""Audio quality gate (reference: scripts/quality_check.py).

Checks a WAV (or directory of WAVs) for duration bounds, RMS level,
leading/trailing silence, clipping fraction, and DC offset; exits non-zero
on failure. Optional Whisper WER check when a `transcribe` callable is
available (openai-whisper is not bundled; plug in any ASR).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qwen3_tts_tpu.audio.io import load_wav


def check_wav(
    path: Path,
    min_duration: float = 0.3,
    max_duration: float = 170.0,
    min_rms: float = 0.005,
    max_clipping: float = 0.01,
    max_leading_silence: float = 2.0,
    max_dc: float = 0.02,
) -> dict:
    buf = load_wav(path)
    x = buf.samples
    sr = buf.sample_rate
    duration = len(x) / sr
    rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
    clipping = float((np.abs(x) >= 0.999).mean()) if len(x) else 0.0
    dc = float(np.mean(x)) if len(x) else 0.0

    # leading silence: first sample above 5% of peak
    peak = float(np.abs(x).max()) if len(x) else 0.0
    if peak > 0:
        above = np.nonzero(np.abs(x) > 0.05 * peak)[0]
        lead = float(above[0] / sr) if len(above) else duration
        trail = float((len(x) - 1 - above[-1]) / sr) if len(above) else duration
    else:
        lead = trail = duration

    failures = []
    if duration < min_duration:
        failures.append(f"too short: {duration:.2f}s < {min_duration}s")
    if duration > max_duration:
        failures.append(f"too long: {duration:.2f}s > {max_duration}s")
    if rms < min_rms:
        failures.append(f"too quiet: rms {rms:.4f} < {min_rms}")
    if clipping > max_clipping:
        failures.append(f"clipping: {clipping:.2%} of samples")
    if lead > max_leading_silence:
        failures.append(f"leading silence {lead:.2f}s")
    if abs(dc) > max_dc:
        failures.append(f"dc offset {dc:.3f}")

    return {
        "file": str(path),
        "sample_rate": sr,
        "duration_s": round(duration, 3),
        "rms": round(rms, 5),
        "clipping_frac": round(clipping, 5),
        "leading_silence_s": round(lead, 3),
        "trailing_silence_s": round(trail, 3),
        "dc_offset": round(dc, 5),
        "pass": not failures,
        "failures": failures,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+", help="WAV files or directories")
    ap.add_argument("--min-rms", type=float, default=0.005)
    ap.add_argument("--max-clipping", type=float, default=0.01)
    ap.add_argument("--min-duration", type=float, default=0.3)
    ap.add_argument("--max-leading-silence", type=float, default=2.0)
    ap.add_argument("--max-dc", type=float, default=0.02)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    files: list[Path] = []
    for p in map(Path, args.paths):
        files.extend(sorted(p.glob("**/*.wav")) if p.is_dir() else [p])
    if not files:
        raise SystemExit("no WAV files found")

    reports = [
        check_wav(
            f,
            min_duration=args.min_duration,
            min_rms=args.min_rms,
            max_clipping=args.max_clipping,
            max_leading_silence=args.max_leading_silence,
            max_dc=args.max_dc,
        )
        for f in files
    ]
    if args.json:
        print(json.dumps(reports, indent=2))
    else:
        for r in reports:
            status = "PASS" if r["pass"] else "FAIL " + "; ".join(r["failures"])
            print(f"{r['file']}: {r['duration_s']}s rms={r['rms']} -> {status}")
    return 0 if all(r["pass"] for r in reports) else 1


if __name__ == "__main__":
    sys.exit(main())
