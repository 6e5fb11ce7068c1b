#!/usr/bin/env python
"""Host-transfer audit (reference: scripts/audit-gpu-syncs.sh).

Two checks:
1. Static: grep the package for device->host transfer sites
   (device_get / np.asarray-on-Array / float()/int() on arrays) and list
   them with context, mirroring the reference's to_vec1 audit.
2. Dynamic: run a tiny-model generation and assert the frame loop performs
   ZERO jax.device_get calls until the final frame fetch.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent / "qwen3_tts_tpu"
PATTERNS = [
    (re.compile(r"device_get"), "explicit device->host transfer"),
    (re.compile(r"np\.asarray\(\s*jax"), "implicit transfer via np.asarray"),
    (re.compile(r"(?<![\w.])(?:int|float|bool)\(\s*(?:self\.)?state\."), "scalar sync on carry"),
    (re.compile(r"block_until_ready"), "synchronization point"),
]


def static_audit() -> int:
    hits = 0
    for path in sorted(ROOT.rglob("*.py")):
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            for pat, label in PATTERNS:
                if pat.search(line):
                    rel = path.relative_to(ROOT.parent)
                    print(f"{rel}:{lineno}: [{label}] {line.strip()}")
                    hits += 1
    print(f"\n{hits} transfer/sync sites (each should be intentional)")
    return hits


def dynamic_audit() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qwen3_tts_tpu.models import weights as W
    from qwen3_tts_tpu.models import talker as TM
    from qwen3_tts_tpu.models.config import CodePredictorConfig, TalkerConfig
    from qwen3_tts_tpu.generation import core, prefill
    from qwen3_tts_tpu.ops import nn, rng, sampling
    from qwen3_tts_tpu.profiling import TransferAudit

    tcfg = TalkerConfig(
        text_embed_dim=32, hidden_size=64, text_proj_intermediate=32,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
    )
    cpcfg = CodePredictorConfig(
        hidden_size=64, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=128,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = W.init_talker_params(k1, tcfg, jnp.float32)
    cpp = W.init_code_predictor_params(k2, cpcfg, jnp.float32)
    scfg = sampling.SamplingConfig()
    max_new = 8
    cache = nn.init_kv_cache(tcfg.layer_stack(), 1, 10 + max_new + 2, jnp.float32)
    uniforms = jnp.asarray(rng.pcg_uniform_sequence(42, max_new + 1))
    text_ids = jnp.array([5, 9, 3, 0, 0, 0, 0, 0], jnp.int32)

    state, trailing, tl, pad = prefill.prefill_custom_voice(
        tp, tcfg, scfg, text_ids, jnp.int32(3), jnp.int32(3061), jnp.int32(2050),
        cache, uniforms, max_new,
    )
    with TransferAudit() as audit:
        state = core.generate_frames_jit(
            tp, cpp, tcfg, cpcfg, scfg, state, trailing, tl, pad, uniforms,
            jnp.int32(max_new),
        )
        jax.block_until_ready(state.frames)
    assert audit.transfers == 0, f"frame loop performed {audit.transfers} host transfers"
    print("dynamic audit: 0 host transfers inside the generation loop ✓")

    # Same proof for the int8 + streaming-kernel configuration.
    from qwen3_tts_tpu.ops import fused_layer as FL
    from qwen3_tts_tpu.ops import quant as Q

    tp8 = Q.quantize_talker_params(W.fuse_model_params(tp))
    cpp8 = Q.quantize_code_predictor_params(W.fuse_model_params(cpp))
    tpack = FL.make_stream_pack(tp8["layers"], tcfg.layer_stack())
    cpack = FL.make_stream_pack(cpp8["layers"], cpcfg.layer_stack())
    if tpack is not None:
        tp8["stream_pack"] = tpack
    if cpack is not None:
        cpp8["stream_pack"] = cpack
    cache8 = nn.init_kv_cache(tcfg.layer_stack(), 1, 10 + max_new + 2, jnp.float32)
    state8, trailing8, tl8, pad8 = prefill.prefill_custom_voice(
        tp8, tcfg, scfg, text_ids, jnp.int32(3), jnp.int32(3061), jnp.int32(2050),
        cache8, uniforms, max_new,
    )
    with TransferAudit() as audit:
        state8 = core.generate_frames_jit(
            tp8, cpp8, tcfg, cpcfg, scfg, state8, trailing8, tl8, pad8, uniforms,
            jnp.int32(max_new),
        )
        jax.block_until_ready(state8.frames)
    assert audit.transfers == 0, (
        f"int8 streamed loop performed {audit.transfers} host transfers"
    )
    print("dynamic audit: 0 host transfers with int8 + streaming kernels ✓")


if __name__ == "__main__":
    static_audit()
    print()
    dynamic_audit()
