#!/usr/bin/env python
"""Golden-dump producer: run the torch oracle over a checkpoint, write dumps.

The reference's tier-3 validation pattern is a Python script that dumps
stage-by-stage tensors which the implementation then diffs against
(/root/reference/tests/reference_validation.rs:11-47 +
scripts/download_test_data.sh:1-109, which fetches the data the harness needs).
This is the in-repo producer: given a Qwen3-TTS checkpoint directory, it runs
the independent PyTorch transcription (``scripts/torch_oracle.py`` — no JAX
code on the compute path) through tokenize → CustomVoice prompt → talker
generation with bit-exact PCG sampling → code predictor → vocoder, and
writes ``test_data/reference_values/`` exactly as
``tests/test_reference_golden.py`` consumes it:

    metadata.json               sentinel + input ids + stage table
    text_embedding.bin          [T, text_embed_dim] raw embedding rows
    text_projection.bin         [T, hidden] projected rows
    talker_forward.bin          [T, codec_vocab] full-forward codec logits
    codes.bin                   [frames, 16] int32 generated codec frames
    vocoder_waveform.bin        [N] float32 decoded waveform

Usage:
    python scripts/dump_reference_values.py --model-dir CKPT \
        [--text "..."] [--speaker ryan] [--language english] [--seed 42]
        [--max-frames 32] [--out test_data/reference_values]

With a checkpoint present, ``make parity`` chains this dump with the golden
tests and quality checks into one command.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts import torch_oracle as TO  # noqa: E402

# ---------------------------------------------------------------------------
# Independent PCG-XSH-RR 64/32 + sampling chain (spec:
# /root/reference/src/generation/sampling.rs:27-319, src/lib.rs:1271-1322).
# Deliberately re-implemented here rather than imported from the package so
# the dump is produced by a fully independent path.
# ---------------------------------------------------------------------------

_MULT = 6364136223846793005
_INC = 1442695040888963407
_SEED_MIX = 2685821657736338717
_M64 = (1 << 64) - 1


class Pcg:
    def __init__(self, seed: int):
        self.state = (seed * _SEED_MIX + _INC) & _M64

    def next_u32(self) -> int:
        old = self.state
        self.state = (old * _MULT + _INC) & _M64
        xorshifted = ((old >> 18) ^ old) >> 27 & 0xFFFFFFFF
        rot = (old >> 59) & 31
        return ((xorshifted >> rot) | (xorshifted << (32 - rot))) & 0xFFFFFFFF if rot else xorshifted

    def uniform(self) -> np.float32:
        return np.float32(np.float32(self.next_u32()) / np.float32(0xFFFFFFFF))


def sample_token(logits: np.ndarray, rng: Pcg, temperature: float, top_k: int,
                 top_p: float) -> int:
    """temperature -> top-k -> top-p -> softmax -> cumsum multinomial."""
    logits = np.asarray(logits, np.float32)
    if temperature > 0.0 and temperature != 1.0:
        logits = logits / np.float32(temperature)
    if temperature < 0.01:
        return int(np.argmax(logits))
    if top_k > 0:
        k = min(top_k, logits.shape[-1])
        thr = np.sort(logits)[-k]
        logits = np.where(logits >= thr, logits, -np.inf)
    if 0.0 < top_p < 1.0:
        desc = np.sort(logits)[::-1]
        probs = np.exp(desc - desc[0])
        probs = probs / probs.sum()
        exclusive = np.concatenate([[0.0], np.cumsum(probs)[:-1]])
        kept = np.where(exclusive >= top_p, np.inf, desc)
        min_kept = kept.min()
        logits = np.where(logits >= min_kept, logits, -np.inf)
    probs = np.exp(logits - logits.max())
    probs = probs / probs.sum()
    u = rng.uniform()
    cum = np.cumsum(probs)
    hits = np.nonzero(cum >= u)[0]
    return int(hits[0]) if len(hits) else int(len(probs) - 1)


def apply_penalties(logits: np.ndarray, seen: set[int], suppression: np.ndarray,
                    penalty: float, token_count: int, min_new: int, eos: int) -> np.ndarray:
    logits = np.asarray(logits, np.float32).copy()
    if abs(penalty - 1.0) > 1e-9 and seen:
        idx = np.fromiter(seen, int)
        vals = logits[idx]
        logits[idx] = np.where(vals > 0, vals / penalty, vals * penalty)
    logits[suppression] = -np.inf
    if token_count < min_new:
        logits[eos] = -np.inf
    return logits


# ---------------------------------------------------------------------------
# Dump pipeline
# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--tokenizer-dir", default=None)
    ap.add_argument("--text", default="The quick brown fox jumps over the lazy dog.")
    ap.add_argument("--speaker", default="ryan")
    ap.add_argument("--language", default="english")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--temperature", type=float, default=0.9)
    ap.add_argument("--top-k", type=int, default=50)
    ap.add_argument("--top-p", type=float, default=0.9)
    ap.add_argument("--repetition-penalty", type=float, default=1.05)
    ap.add_argument("--min-new-tokens", type=int, default=2)
    ap.add_argument("--max-frames", type=int, default=32)
    ap.add_argument(
        "--vocoder-json",
        default=None,
        help="JSON file overriding VocoderConfig fields (tiny/synthetic ckpts)",
    )
    ap.add_argument("--out", default=str(REPO / "test_data" / "reference_values"))
    args = ap.parse_args(argv)

    from safetensors.numpy import load_file

    from qwen3_tts_tpu.models import tokens as T
    from qwen3_tts_tpu.models.config import parse_config_json
    from qwen3_tts_tpu.tokenizer import TextTokenizer

    model_dir = Path(args.model_dir)
    if args.vocoder_json is None and (model_dir / "vocoder_config.json").exists():
        # Sidecar written by scripts/make_synthetic_ckpt.py (absent from
        # production checkpoints) — same auto-detection as from_pretrained.
        args.vocoder_json = str(model_dir / "vocoder_config.json")
    cfg = parse_config_json(model_dir / "config.json")
    print(f"checkpoint: {cfg.label}", file=sys.stderr)
    w = load_file(model_dir / "model.safetensors")
    st_path = model_dir / "speech_tokenizer" / "model.safetensors"
    st_w = load_file(st_path) if st_path.exists() else None

    tokenizer = TextTokenizer.from_pretrained(args.tokenizer_dir or model_dir)
    input_ids = tokenizer.encode(args.text)
    print(f"text tokens: {len(input_ids)}", file=sys.stderr)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    stages: dict[str, dict] = {}

    def dump(name: str, arr: np.ndarray, dtype: str | None = None):
        arr = np.ascontiguousarray(arr)
        arr.tofile(out_dir / f"{name}.bin")
        entry = {"file": f"{name}.bin", "shape": list(arr.shape)}
        if dtype:
            entry["dtype"] = dtype
        stages[name] = entry
        print(f"  {name}: shape={list(arr.shape)}", file=sys.stderr)

    talker = TO.TalkerOracle(w, cfg.talker)
    cp = TO.CodePredictorOracle(w, cfg.code_predictor)

    with torch.no_grad():
        ids_t = torch.as_tensor(input_ids, dtype=torch.long)
        raw = talker.embed_text_raw(ids_t)
        dump("text_embedding", np.asarray(raw, np.float32))
        projected = talker.text_project(raw)
        dump("text_projection", np.asarray(projected, np.float32))
        dump(
            "talker_forward",
            np.asarray(talker.forward_logits(projected[None])[0], np.float32),
        )

        # --- CustomVoice prompt (talker.rs:451-491): role(3) + overlay(6)
        # + first_text+codec_bos(1) ---
        role = talker.embed_text([T.IM_START, T.ASSISTANT, T.NEWLINE])
        overlay = talker.embed_text([T.TTS_PAD] * 5 + [T.TTS_BOS]) + talker.embed_codec(
            [
                T.CODEC_THINK,
                T.CODEC_THINK_BOS,
                T.language_token_id(args.language),
                T.CODEC_THINK_EOS,
                T.speaker_info(args.speaker).token_id,
                T.CODEC_PAD,
            ]
        )
        first = talker.embed_text([input_ids[0]]) + talker.embed_codec([T.CODEC_BOS])
        prompt = torch.cat([role, overlay, first], dim=0)[None]  # [1, 10, H]

        # Trailing text schedule (src/lib.rs:508-519): frame i fuses token
        # i+1 while i < len-1, tts_eos at len-1, tts_pad after.
        trailing = [talker.embed_text([t])[0] for t in input_ids[1:]]
        trailing.append(talker.embed_text([T.TTS_EOS])[0])
        pad_row = talker.embed_text([T.TTS_PAD])[0]

        suppression = np.zeros(cfg.talker.codec_vocab_size, bool)
        v = cfg.talker.codec_vocab_size
        suppression[v - 1024 :] = True
        suppression[T.CODEC_EOS] = False

        rng = Pcg(args.seed)
        seen: set[int] = set()

        # Prefill: full forward over the prompt, sample first token.
        hidden = talker.forward_hidden(prompt)
        logits = np.asarray(talker.codec_logits(hidden[:, -1, :])[0])
        logits = apply_penalties(
            logits, seen, suppression, args.repetition_penalty, 0,
            args.min_new_tokens, T.CODEC_EOS,
        )
        token = sample_token(logits, rng, args.temperature, args.top_k, args.top_p)
        seen.add(token)

        frames = []
        emb_seq = prompt  # growing [1, S, H]; no-cache oracle recomputes fully
        while token != T.CODEC_EOS and len(frames) < args.max_frames:
            semantic = talker.embed_codec([token])[None]  # [1, 1, H]
            talker_hidden = hidden[:, -1:, :]
            codes = cp.predict(talker_hidden, semantic)
            frames.append(np.concatenate([[token], codes]).astype(np.int32))

            acoustic = cp.acoustic_embedding_sum(codes)
            i = len(frames) - 1
            text_add = trailing[i] if i < len(trailing) else pad_row
            step = semantic + acoustic + text_add[None, None, :]
            emb_seq = torch.cat([emb_seq, step], dim=1)
            hidden = talker.forward_hidden(emb_seq)
            logits = np.asarray(talker.codec_logits(hidden[:, -1, :])[0])
            logits = apply_penalties(
                logits, seen, suppression, args.repetition_penalty, len(frames),
                args.min_new_tokens, T.CODEC_EOS,
            )
            token = sample_token(logits, rng, args.temperature, args.top_k, args.top_p)
            seen.add(token)

        codes_arr = (
            np.stack(frames) if frames else np.zeros((0, 16), np.int32)
        ).astype(np.int32)
        dump("codes", codes_arr, dtype="int32")

        if st_w is not None and len(codes_arr):
            from qwen3_tts_tpu.models.codec.vocoder import VocoderConfig

            overrides = {}
            if args.vocoder_json:
                overrides = json.loads(Path(args.vocoder_json).read_text())
                for key in ("upsampling_ratios", "upsample_rates"):
                    if key in overrides:
                        overrides[key] = tuple(overrides[key])
            try:
                voc = TO.VocoderOracle(st_w, VocoderConfig(**overrides))
            except KeyError as e:
                raise SystemExit(
                    f"vocoder weight key missing ({e}): the speech tokenizer "
                    "does not match the default 12 Hz VocoderConfig — pass "
                    "--vocoder-json with the checkpoint's dimensions"
                ) from e
            wav = voc.decode(codes_arr.T[None])[0]
            dump("vocoder_waveform", np.asarray(wav, np.float32))
        else:
            print("  (no speech tokenizer weights; skipping vocoder dump)",
                  file=sys.stderr)

    meta = {
        "model_dir": str(model_dir.resolve()),
        "text": args.text,
        "speaker": args.speaker,
        "language": args.language,
        "seed": args.seed,
        "sampling": {
            "temperature": args.temperature,
            "top_k": args.top_k,
            "top_p": args.top_p,
            "repetition_penalty": args.repetition_penalty,
            "min_new_tokens": args.min_new_tokens,
        },
        "input_ids": list(map(int, input_ids)),
        "stages": stages,
    }
    (out_dir / "metadata.json").write_text(json.dumps(meta, indent=2))
    print(f"wrote {out_dir}/metadata.json ({len(stages)} stages, "
          f"{len(codes_arr)} frames)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
