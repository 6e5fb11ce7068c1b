"""A/B the whole-frame CP kernel's VMEM residency (journal R3.7).

Times ONLY fused_layer.streamed_cp_frame as one jitted program with an
internal data-chained fori_loop, once per requested resident-layer count
(default: the production value vs +1). Params are jit arguments, so the
program matches the production loop's layout and compiles in seconds.

Run: python benches/cp_ab.py [--size 1.7B] [--frames 200] [--int8]
     [--resident 2 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.7B", choices=["0.6B", "1.7B"])
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--resident", type=int, nargs="+", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.pipeline import Qwen3TTS
    from qwen3_tts_tpu.ops import fused_layer

    cfg = config_for_variant(args.size, "custom_voice")
    model = Qwen3TTS.from_random(cfg)
    if args.int8:
        model = Qwen3TTS(
            model.config, model.talker_params, model.cp_params,
            model.vocoder_params, model.tokenizer,
            vocoder_config=model.vocoder_config, quantize_int8=True,
        )
    cpp, cpcfg = model.cp_params, cfg.code_predictor
    assert fused_layer.supports_cp_frame_kernel(cpp, cpcfg)

    layers = cpcfg.layer_stack().num_layers
    if args.resident is None:
        # Production residency at the current budget, and one more layer.
        base = fused_layer.cp_resident_layers(cpp, cpcfg)
        args.resident = sorted({base, min(layers, base + 1)})

    hidden = cpcfg.embed_dim  # talker width; mtp-projected inside the kernel
    n = args.frames
    print(f"device: {jax.devices()[0]}  int8: {args.int8}  layers: {layers}")

    @partial(jax.jit, static_argnums=(1,))
    def cp_loop(cpp, resident, h0, s0):
        def body(i, carry):
            h, s = carry
            codes = fused_layer.streamed_cp_frame(
                cpp, cpcfg, h, s, resident_override=resident)
            return (h + codes.sum().astype(h.dtype) * 1e-9, s)
        return jax.lax.fori_loop(0, n, body, (h0, s0))

    h0 = jnp.zeros((1, 1, hidden), jnp.bfloat16) + 0.01
    s0 = jnp.zeros((1, 1, hidden), jnp.bfloat16) + 0.02

    results = {}
    for resident in args.resident:
        try:
            jax.block_until_ready(cp_loop(cpp, resident, h0, s0))
            t0 = time.perf_counter()
            jax.block_until_ready(cp_loop(cpp, resident, h0, s0))
            ms = (time.perf_counter() - t0) * 1e3 / n
        except Exception as e:  # VMEM OOM at high residency is expected
            print(f"resident={resident}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
            results[f"resident_{resident}"] = None
            continue
        print(f"resident={resident}: {ms:8.3f} ms/frame")
        results[f"resident_{resident}"] = ms
    if args.json:
        Path(args.json).write_text(json.dumps(results))


if __name__ == "__main__":
    main()
