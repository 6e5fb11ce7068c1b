#!/usr/bin/env python
"""int8 quality guardrails: per-layer quantization SNR + talker-logit drift.

Pre-checkpoint stand-in for a listening test (VERDICT r2 next-item 7): when
real weights land, run

    python scripts/quant_report.py --model-dir CKPT [--out report.json]

(also wired into ``make parity``). Without a checkpoint it runs on the
synthetic-weight model so the machinery itself is exercised in CI.

Reported metrics
----------------
* per-projection weight SNR (dB), worst layer and median, for every
  quantized linear in the talker and code predictor;
* talker-logit divergence over a set of decode steps: KL(bf16 || int8)
  after softmax, plus the argmax flip rate — the quantity that decides
  whether sampled token streams drift;
* code-predictor argmax flip rate (acoustic codes are argmax-decoded, so
  flips here change audio directly).

Promote/demote criterion (documented, applied by the report):
  PROMOTE int8 to default when   worst-layer SNR >= 30 dB
                             AND mean logit KL <= 5e-3
                             AND talker argmax flip rate <= 1%
                             AND CP code flip rate <= 1%.
  Otherwise int8 stays opt-in. Real-checkpoint logits are peaked (far from
  the near-uniform synthetic ones), so synthetic flip rates OVERSTATE
  drift; the criterion is meant for real weights.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _snr_db(w: np.ndarray, q8: np.ndarray, scale: np.ndarray) -> float:
    deq = q8.astype(np.float32) * scale
    err = w - deq
    p_sig = float((w**2).mean())
    p_err = float((err**2).mean()) + 1e-30
    return 10.0 * np.log10(p_sig / p_err)


def weight_snr_report(plain_layers: dict, quant_layers: dict) -> dict:
    """Per-projection SNR stats across the layer stack."""
    from qwen3_tts_tpu.ops import quant as Q

    out = {}
    for key, qw in quant_layers.items():
        if not Q.is_quantized(qw):
            continue
        w = np.asarray(plain_layers[key], np.float32)  # [L, K, N]
        q8 = np.asarray(qw["q8"])
        scale = np.asarray(qw["scale"], np.float32)
        if w.ndim == 2:
            w, q8, scale = w[None], q8[None], scale[None]
        snrs = [_snr_db(w[l], q8[l], scale[l]) for l in range(w.shape[0])]
        out[key] = {
            "min_db": round(min(snrs), 2),
            "median_db": round(float(np.median(snrs)), 2),
            "layers": len(snrs),
        }
    return out


def logit_drift_report(
    model_plain, model_int8, n_steps: int = 16, seed: int = 0, w8a8: bool = False
) -> dict:
    """Drive both models through identical decode steps and compare logits.

    The int8 model consumes the PLAIN model's sampled token stream, so both
    see identical inputs at every step and the comparison isolates
    quantization error (no compounding divergence).
    """
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.models import code_predictor as cp_model
    from qwen3_tts_tpu.models import talker as talker_model
    from qwen3_tts_tpu.models import tokens as T
    from qwen3_tts_tpu.ops import nn, rng, sampling

    cfg = model_plain.config
    scfg = sampling.SamplingConfig()
    max_seq = 10 + n_steps + 8

    def run(model, token_stream=None):
        tparams, cpparams = model.talker_params, model.cp_params
        cache = nn.init_kv_cache(
            cfg.talker.layer_stack(), 1, max_seq, model.compute_dtype
        )
        prompt = talker_model.build_custom_voice_prompt(
            tparams,
            jnp.int32(5),
            jnp.int32(T.SPEAKERS["ryan"].token_id),
            jnp.int32(T.LANGUAGES["english"]),
        )
        last, logits, cache = talker_model.prefill(
            tparams, cfg.talker, prompt, jnp.int32(prompt.shape[1]), cache
        )
        uniforms = rng.pcg_uniform_sequence(42 + seed, n_steps + 1)
        logits_seq, codes_seq, tokens = [], [], []
        token = (
            sampling.sample(
                jnp.asarray(logits), scfg, jnp.float32(uniforms[0])
            )[0]
            if token_stream is None
            else jnp.int32(token_stream[0])
        )
        pos = prompt.shape[1]
        for i in range(n_steps):
            tokens.append(int(token))
            semantic = talker_model.embed_codec(tparams, token)[None, None, :]
            codes = cp_model.predict_acoustic_codes(
                cpparams, cfg.code_predictor, last, semantic
            )
            codes_seq.append(np.asarray(codes))
            acoustic = cp_model.acoustic_embedding_sum(cpparams, codes).astype(
                semantic.dtype
            )
            step = semantic + acoustic
            last, logits, cache = talker_model.decode_step(
                tparams, cfg.talker, step, jnp.int32(pos), cache
            )
            logits_seq.append(np.asarray(logits[0], np.float32))
            token = (
                sampling.sample(logits, scfg, jnp.float32(uniforms[i + 1]))[0]
                if token_stream is None
                else jnp.int32(token_stream[min(i + 1, len(token_stream) - 1)])
            )
            pos += 1
        return tokens, np.stack(logits_seq), np.stack(codes_seq)

    tokens, logits_ref, codes_ref = run(model_plain)
    if w8a8:
        # Everything here is eager (no module-level jit), so the trace
        # scope applies per op — no stale-compile risk.
        from qwen3_tts_tpu.ops import quant as Q

        with Q.w8a8_scope(True):
            _, logits_q, codes_q = run(model_int8, token_stream=tokens)
    else:
        _, logits_q, codes_q = run(model_int8, token_stream=tokens)

    def softmax(x):
        x = x - x.max(-1, keepdims=True)
        e = np.exp(x)
        return e / e.sum(-1, keepdims=True)

    p = softmax(logits_ref)
    q = softmax(logits_q)
    kl = float((p * (np.log(p + 1e-12) - np.log(q + 1e-12))).sum(-1).mean())
    talker_flips = float((logits_ref.argmax(-1) != logits_q.argmax(-1)).mean())
    cp_flips = float((codes_ref != codes_q).mean())
    return {
        "steps": n_steps,
        "mean_logit_kl": kl,
        "talker_argmax_flip_rate": talker_flips,
        "cp_code_flip_rate": cp_flips,
    }


PROMOTE_CRITERION = {
    "min_weight_snr_db": 30.0,
    "max_mean_logit_kl": 5e-3,
    "max_talker_flip_rate": 0.01,
    "max_cp_flip_rate": 0.01,
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None, help="real checkpoint (else synthetic)")
    ap.add_argument("--variant", default="0.6B")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--out", default=None, help="write the JSON report here")
    ap.add_argument(
        "--tpu",
        action="store_true",
        help="run on the TPU backend (default: CPU — drift metrics are "
        "about numerics, not speed, and this avoids touching the chip)",
    )
    args = ap.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qwen3_tts_tpu.models import weights as W
    from qwen3_tts_tpu.models.config import config_for_variant
    from qwen3_tts_tpu.ops import quant as Q
    from qwen3_tts_tpu.pipeline import Qwen3TTS

    if args.model_dir:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        model_plain = Qwen3TTS.from_pretrained(args.model_dir, dtype=dtype)
        model_int8 = Qwen3TTS.from_pretrained(
            args.model_dir, dtype=dtype, quantize_int8=True
        )
        source = args.model_dir
    else:
        if args.variant == "tiny":
            # CI-sized config: exercises the full report machinery cheaply.
            from dataclasses import replace as dc_replace

            from qwen3_tts_tpu.models.config import (
                CodePredictorConfig,
                ModelConfig,
                ModelType,
                TalkerConfig,
            )

            cfg = ModelConfig(
                model_type=ModelType.CUSTOM_VOICE,
                model_size="0b6",
                talker=TalkerConfig(
                    text_embed_dim=32, hidden_size=64, text_proj_intermediate=32,
                    intermediate_size=128, num_hidden_layers=2,
                    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                ),
                code_predictor=CodePredictorConfig(
                    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                    vocab_size=128,
                ),
            )
        else:
            cfg = config_for_variant(args.variant, "custom_voice")
        model_plain = Qwen3TTS.from_random(cfg, seed=0)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        from qwen3_tts_tpu.models.codec import vocoder

        model_int8 = Qwen3TTS(
            cfg,
            W.init_talker_params(k1, cfg.talker),
            W.init_code_predictor_params(k2, cfg.code_predictor),
            vocoder.init_vocoder_params(k3),
            None,
            quantize_int8=True,
        )
        source = f"synthetic:{args.variant}"

    plain_t = W.fuse_model_params(model_plain.talker_params)
    plain_c = W.fuse_model_params(model_plain.cp_params)
    report = {
        "source": source,
        "talker_weight_snr": weight_snr_report(
            plain_t["layers"], model_int8.talker_params["layers"]
        ),
        "cp_weight_snr": weight_snr_report(
            plain_c["layers"], model_int8.cp_params["layers"]
        ),
        "logit_drift": logit_drift_report(model_plain, model_int8, args.steps),
        # w8a8 (batched throughput mode, Qwen3TTS int8_activations=True)
        # adds per-token activation rounding on top of weight quantization;
        # the same promote criterion applies before enabling it in serving.
        "logit_drift_w8a8": logit_drift_report(
            model_plain, model_int8, args.steps, w8a8=True
        ),
        "promote_criterion": PROMOTE_CRITERION,
    }
    snrs = [
        v["min_db"]
        for sec in ("talker_weight_snr", "cp_weight_snr")
        for v in report[sec].values()
    ]
    drift = report["logit_drift"]
    report["promote_int8"] = bool(
        snrs
        and min(snrs) >= PROMOTE_CRITERION["min_weight_snr_db"]
        and drift["mean_logit_kl"] <= PROMOTE_CRITERION["max_mean_logit_kl"]
        and drift["talker_argmax_flip_rate"]
        <= PROMOTE_CRITERION["max_talker_flip_rate"]
        and drift["cp_code_flip_rate"] <= PROMOTE_CRITERION["max_cp_flip_rate"]
    )
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
