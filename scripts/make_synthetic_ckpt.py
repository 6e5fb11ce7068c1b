#!/usr/bin/env python
"""Write a complete synthetic Qwen3-TTS checkpoint directory.

The checkpoint-landing drill (docs/VALIDATION.md): ``make parity`` must be
proven end-to-end *before* a real checkpoint exists, so the one-command
runbook is known-good when weights land. This script serializes the tiny
but structurally complete HF-layout weights from
``tests/test_checkpoint_loading.py`` (exact real key names + tensor
orientations: talker.*, talker.code_predictor.*, speaker_encoder.*,
decoder.*, encoder.*) into a directory ``Qwen3TTS.from_pretrained`` and the
torch oracle (scripts/torch_oracle.py) both load with no extra arguments:

    ckpt/
      config.json                     tiny 0.6B-shaped variant config
      model.safetensors               talker + code predictor + speaker enc
      speech_tokenizer/model.safetensors   vocoder decoder + Mimi encoder
      vocab.json + merges.txt         byte-level BPE (tokenizer 4-way path 3)
      vocoder_config.json             sidecar: tiny VocoderConfig dims
      mimi_config.json                sidecar: tiny MimiEncoderConfig dims

The sidecar JSONs are read by ``from_pretrained`` (pipeline._sidecar_config)
and by ``scripts/dump_reference_values.py`` so the whole parity chain runs
against non-production dimensions without per-command overrides. Production
checkpoints don't carry sidecars and use the default 12 Hz dims.

Usage:
    python scripts/make_synthetic_ckpt.py [--out /tmp/qwen3_synth_ckpt]

Then:  make parity-drill          (CPU, lenient audio gates — random weights)
  or:  make parity MODEL_DIR=/tmp/qwen3_synth_ckpt QC_FLAGS="--min-rms 0 ..."
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def write_ckpt(out: Path) -> Path:
    from safetensors.numpy import save_file
    from tokenizers.pre_tokenizers import ByteLevel

    # The synthetic weight builders live next to the loading tests they
    # guard; reusing them keeps this script and test_checkpoint_loading
    # structurally identical by construction (test_dump_producer.py does
    # the same import).
    import tests.test_checkpoint_loading as tc

    out.mkdir(parents=True, exist_ok=True)
    (out / "speech_tokenizer").mkdir(exist_ok=True)
    save_file(tc.build_model_weights(), out / "model.safetensors")
    save_file(
        tc.build_speech_tokenizer_weights(),
        out / "speech_tokenizer" / "model.safetensors",
    )
    (out / "config.json").write_text(json.dumps(tc.CONFIG_JSON, indent=2))

    # Byte-level BPE with no merges: every byte is a token, so the pipeline
    # tokenizer and the oracle tokenize identically, and the vocab.json +
    # merges.txt rebuild path (tokenizer.py resolution step 3) is exercised.
    vocab = {ch: i for i, ch in enumerate(sorted(ByteLevel.alphabet()))}
    (out / "vocab.json").write_text(json.dumps(vocab))
    (out / "merges.txt").write_text("#version: 0.2\n")

    (out / "vocoder_config.json").write_text(
        json.dumps(
            {
                "codebook_dim": tc.V_CB_DIM,
                "latent_dim": tc.V_LATENT,
                "hidden_size": tc.V_HID,
                "num_layers": 2,
                "num_heads": tc.V_HEADS,
                "head_dim": tc.V_HD,
                "intermediate_size": tc.V_INTER,
                "codebook_embed_dim": tc.V_EMB,
                "decoder_dim": tc.V_DEC,
            },
            indent=2,
        )
    )
    (out / "mimi_config.json").write_text(
        json.dumps(
            {
                "num_filters": tc.MIMI_FILTERS,
                "ratios": list(tc.MIMI_RATIOS),
                "hidden_size": tc.MIMI_HID,
                "num_layers": 2,
                "num_heads": 2,
                "head_dim": 8,
                "intermediate_size": 32,
                "codebook_size": tc.CP_VOCAB,
                "codebook_dim": 8,
                "num_quantizers": 16,
                "sliding_window": 50,
            },
            indent=2,
        )
    )
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="/tmp/qwen3_synth_ckpt")
    args = ap.parse_args(argv)
    path = write_ckpt(Path(args.out))
    print(f"synthetic checkpoint written to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
