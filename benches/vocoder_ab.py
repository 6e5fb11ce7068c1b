"""Same-session XLA-taps vs fused-Pallas vocoder decode A/B.

The vocoder tail's residual units run as one Pallas kernel per unit on TPU
(models/codec/fused_blocks.py): the taps-as-matmul form issues 7 un-fusable
dots per k=7 conv, ~14x the unit's ideal HBM traffic at the 1920
samples/frame tail. This harness measures batch vocoder decode with the
kernel on and off in ONE process, A-B-A (xla, fused, xla): if the two xla
phases agree, the tunnel weather was stable and the fused delta is real.

The mode switch is the trace-time routing gate
(``fused_blocks.residual_unit_should_fuse`` honours
``QWEN3_TTS_NO_VOCODER_KERNELS`` when tracing); each leg traces a fresh
jit wrapper so the env flip takes effect, and identical-HLO legs hit the
persistent compile cache.

Run: python benches/vocoder_ab.py [--size 1.7B] [--batches 1 8] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(vp, vcfg, codes, iters, warmup=1):
    import jax

    from qwen3_tts_tpu.models.codec import vocoder as V

    # Fresh wrapper => fresh trace under the CURRENT routing env; legs with
    # identical HLO dedupe in the persistent compile cache. V.decode is the
    # production path (matmul precision "highest").
    fn = jax.jit(lambda p, c: V.decode(p, vcfg, c))
    for _ in range(warmup):
        jax.block_until_ready(fn(vp, codes))
    walls = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(vp, codes))
        walls.append(time.perf_counter() - t0)
    return {
        "wall_ms": round(statistics.mean(walls) * 1e3, 1),
        "wall_ms_min": round(min(walls) * 1e3, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS

    cfg = config_for_variant(args.size, "custom_voice")
    m = Qwen3TTS.from_random(cfg)
    vp, vcfg = m.vocoder_params, m.vocoder_config

    out = {"model": f"synthetic-{args.size}", "frames": args.frames, "rows": []}
    for b in args.batches:
        codes = jnp.ones((b, 16, args.frames), jnp.int32)
        row = {"batch": b}
        for phase, fused in (("xla_a", False), ("fused", True), ("xla_b", False)):
            if fused:
                os.environ.pop("QWEN3_TTS_NO_VOCODER_KERNELS", None)
            else:
                os.environ["QWEN3_TTS_NO_VOCODER_KERNELS"] = "1"
            row[phase] = measure(vp, vcfg, codes, args.iters)
            print(f"batch {b} {phase}: {row[phase]}", file=sys.stderr)
        os.environ.pop("QWEN3_TTS_NO_VOCODER_KERNELS", None)
        a, a2, f = row["xla_a"], row["xla_b"], row["fused"]
        base = (a["wall_ms"] + a2["wall_ms"]) / 2
        row["session_drift_pct"] = round(
            abs(a["wall_ms"] - a2["wall_ms"]) / max(a["wall_ms"], 1e-9) * 100, 1
        )
        row["fused_speedup_pct"] = round((base - f["wall_ms"]) / base * 100, 1)
        row["frame_ms_xla"] = round(base / args.frames, 3)
        row["frame_ms_fused"] = round(f["wall_ms"] / args.frames, 3)
        out["rows"].append(row)

    print(json.dumps(out, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
