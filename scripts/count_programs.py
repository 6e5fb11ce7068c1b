#!/usr/bin/env python
"""Program/launch-count fusion-regression check.

TPU equivalent of the reference's ``scripts/count-kernels.sh`` (which counts
CUDA kernel launches per frame from a Chrome trace): compile the three hot
programs — prefill, the frame-generation while_loop, and the fused streaming
advance+decode chunk — and assert the dispatch budget that the architecture
promises:

  * the ENTIRE frame loop is ONE XLA executable containing ONE top-level
    while loop (the reference needs hundreds of kernel launches per frame;
    a regression that splits the loop would show up here as extra programs
    or extra host round-trips),
  * no infeed/outfeed or host callbacks inside any hot program,
  * the number of Pallas custom calls per program matches the configured
    kernel plan (0 on the CPU test backend, where the streaming kernels run
    in interpret mode / XLA fallback),
  * the HLO instruction count per program stays under a generous budget —
    a blown budget means XLA stopped fusing something it used to fuse.

Runs on CPU; CI-callable (tests/test_program_budget.py) and usable as a
report: ``python scripts/count_programs.py``.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# Budgets are deliberately loose (2x headroom at tiny dims): they catch
# order-of-magnitude fusion regressions, not single-op drift.
INSTRUCTION_BUDGETS = {
    "prefill": 4000,
    "frame_loop": 6000,
    "chunk_exact": 12000,
}


def _metrics(hlo: str) -> dict:
    return {
        "instructions": len(re.findall(r"^\s+\S+ = ", hlo, re.M)),
        # HLO text: `%while.N = (<tuple type>) while(...)` — match the
        # instruction name, not `= while(` (a type sits between them).
        "while_ops": len(re.findall(r"%while[.\d]* = ", hlo)),
        "custom_calls": len(re.findall(r"custom-call", hlo)),
        "pallas_calls": len(re.findall(r"tpu_custom_call|mosaic", hlo)),
        "infeed_outfeed": len(re.findall(r"\b(?:infeed|outfeed)\b", hlo)),
        "host_callbacks": len(re.findall(r"xla_python_cpu_callback|io_callback", hlo)),
    }


def compile_and_count() -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import qwen3_tts_tpu.pipeline as P
    from qwen3_tts_tpu.generation import core, prefill
    from qwen3_tts_tpu.models import weights as W
    from qwen3_tts_tpu.models.codec import vocoder
    from qwen3_tts_tpu.models.config import CodePredictorConfig, TalkerConfig
    from qwen3_tts_tpu.ops import nn, rng, sampling

    tcfg = TalkerConfig(
        text_embed_dim=32, hidden_size=64, text_proj_intermediate=32,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
    )
    cpcfg = CodePredictorConfig(
        hidden_size=64, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=128,
    )
    vcfg = vocoder.VocoderConfig(
        codebook_dim=16, latent_dim=24, hidden_size=16, num_layers=2,
        num_heads=2, head_dim=8, intermediate_size=32, codebook_size=2048,
        codebook_embed_dim=8, decoder_dim=32,
    )
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    tp = W.init_talker_params(k1, tcfg, jnp.float32)
    cpp = W.init_code_predictor_params(k2, cpcfg, jnp.float32)
    vp = vocoder.init_vocoder_params(k3, vcfg)
    scfg = sampling.SamplingConfig()
    max_new, chunk = 8, 4
    cache = nn.init_kv_cache(tcfg.layer_stack(), 1, 10 + max_new + 2, jnp.float32)
    uniforms = jnp.asarray(rng.pcg_uniform_sequence(42, max_new + 1))
    text_ids = jnp.array([5, 9, 3, 0, 0, 0, 0, 0], jnp.int32)

    report: dict[str, dict] = {}

    lowered = prefill.prefill_custom_voice.lower(
        tp, tcfg, scfg, text_ids, jnp.int32(3), jnp.int32(3061), jnp.int32(2050),
        cache, uniforms, max_new,
    )
    report["prefill"] = _metrics(lowered.compile().as_text())

    state, trailing, tl, pad = prefill.prefill_custom_voice(
        tp, tcfg, scfg, text_ids, jnp.int32(3), jnp.int32(3061), jnp.int32(2050),
        nn.init_kv_cache(tcfg.layer_stack(), 1, 10 + max_new + 2, jnp.float32),
        uniforms, max_new,
    )
    lowered = core.generate_frames_jit.lower(
        tp, cpp, tcfg, cpcfg, scfg, state, trailing, tl, pad, uniforms,
        jnp.int32(max_new),
    )
    report["frame_loop"] = _metrics(lowered.compile().as_text())

    vstate = vocoder.init_stream_state(vcfg, max_frames=max_new)
    lowered = P._advance_and_decode_chunk_exact.lower(
        tp, cpp, vp, tcfg, cpcfg, scfg, vcfg, state, vstate, trailing, tl, pad,
        uniforms, jnp.int32(chunk), jnp.int32(0), chunk,
    )
    report["chunk_exact"] = _metrics(lowered.compile().as_text())
    return report


def check(report: dict) -> list[str]:
    """Return a list of budget violations (empty = pass)."""
    errors = []
    for name, m in report.items():
        if m["infeed_outfeed"] or m["host_callbacks"]:
            errors.append(f"{name}: host communication inside the program: {m}")
        if m["instructions"] > INSTRUCTION_BUDGETS[name]:
            errors.append(
                f"{name}: {m['instructions']} HLO instructions exceeds the "
                f"{INSTRUCTION_BUDGETS[name]} fusion budget"
            )
    if report["frame_loop"]["while_ops"] < 1:
        errors.append("frame_loop: expected a single fused while loop, found none")
    if report["chunk_exact"]["while_ops"] < 1:
        errors.append("chunk_exact: the generation while loop is missing")
    return errors


def main() -> int:
    report = compile_and_count()
    print(json.dumps(report, indent=2))
    errors = check(report)
    if errors:
        for e in errors:
            print("FAIL:", e)
        return 1
    print("program/launch budget OK: 1 executable per hot path, no host comms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
