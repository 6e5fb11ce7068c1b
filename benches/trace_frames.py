"""Capture an xprof trace of the production int8 frame loop and report
per-op device time (see scripts/trace_report.py for the parser).

Runs generate_frames_jit directly on a hand-built GenState at production
shapes (288-row cache = pipeline._new_cache(10, 256)), so the cached
program from the e2e bench is reused when available.

Run: python benches/trace_frames.py [--size 1.7B] [--frames 64] [--no-int8]
     [--out /tmp/qwen3_trace]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--cache-rows", type=int, default=288)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--out", default="/tmp/qwen3_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS
    from qwen3_tts_tpu.generation import core
    from qwen3_tts_tpu.ops import nn, sampling

    cfg = config_for_variant(args.size, "custom_voice")
    model = Qwen3TTS.from_random(cfg)
    if not args.no_int8:
        model = Qwen3TTS(
            model.config, model.talker_params, model.cp_params,
            model.vocoder_params, model.tokenizer,
            vocoder_config=model.vocoder_config, quantize_int8=True,
        )
    tcfg, cpcfg = cfg.talker, cfg.code_predictor
    tp, cpp = model.talker_params, model.cp_params
    hidden = tcfg.hidden_size
    rows = args.cache_rows
    max_new = 256
    scfg = sampling.SamplingConfig()
    print(f"device: {jax.devices()[0]}  int8: {not args.no_int8}  rows: {rows}")

    def fresh_state():
        return core.GenState(
            cache=nn.init_kv_cache(tcfg.layer_stack(), 1, rows, jnp.bfloat16),
            last_hidden=jnp.zeros((1, 1, hidden), jnp.bfloat16) + 0.01,
            token=jnp.int32(5),
            penalty_mask=jnp.zeros((tcfg.codec_vocab_size,), jnp.float32),
            frames=jnp.zeros((max_new, 16), jnp.int32),
            frame_idx=jnp.int32(0),
            pos=jnp.int32(10),
            done=jnp.asarray(False),
        )

    trailing = jnp.zeros((32, hidden), jnp.bfloat16)
    pad_embed = jnp.zeros((hidden,), jnp.bfloat16)
    uni = jnp.linspace(0.01, 0.99, max_new + 1)
    limit = jnp.int32(args.frames)

    def run(st):
        return core.generate_frames_jit(
            tp, cpp, tcfg, cpcfg, scfg, st, trailing, jnp.int32(20),
            pad_embed, uni, limit,
        )

    print("compiling/warming frame loop...", flush=True)
    jax.block_until_ready(run(fresh_state()))
    st = fresh_state()
    t0 = time.perf_counter()
    st = run(st)
    jax.block_until_ready(st)
    wall = time.perf_counter() - t0
    print(f"steady-state: {wall * 1e3 / args.frames:.3f} ms/frame "
          f"({args.frames} frames, {wall * 1e3:.1f} ms total)", flush=True)

    out = Path(args.out)
    print(f"tracing into {out} ...", flush=True)
    with jax.profiler.trace(str(out)):
        jax.block_until_ready(run(fresh_state()))

    subprocess.run(
        [sys.executable, str(Path(__file__).resolve().parent.parent / "scripts" / "trace_report.py"),
         str(out), "--frames", str(args.frames), "--top", "30"],
        check=False,
    )


if __name__ == "__main__":
    main()
