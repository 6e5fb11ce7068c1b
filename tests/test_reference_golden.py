"""Golden-file validation harness (reference: tests/reference_validation.rs).

Stage-by-stage numerical parity against tensors dumped from the official
Python implementation. Dumps live in ``test_data/reference_values/`` as raw
float32 binaries with a ``metadata.json`` sentinel:

    {
      "model_dir": "...",                # checkpoint the dumps came from
      "text": "...", "input_ids": [...],
      "stages": {
        "text_embedding":   {"file": "text_embedding.bin",   "shape": [T, 2048]},
        "text_projection":  {"file": "text_projection.bin",  "shape": [T, H]},
        "talker_forward":   {"file": "talker_forward.bin",   "shape": [T, 3072]},
        "vocoder_waveform": {"file": "vocoder_waveform.bin", "shape": [N]},
        "codes":            {"file": "codes.bin",            "shape": [T, 16],
                             "dtype": "int32"}
      }
    }

Tests skip silently when dumps or the checkpoint are absent (the
reference's skip-if-absent pattern, reference_validation.rs:11-47).

Producer: ``scripts/dump_reference_values.py`` (torch-oracle harness) — or
``make parity MODEL_DIR=...`` for the full dump -> golden -> quality chain.
The producer+consumer pair is itself tested end-to-end on a synthetic
checkpoint in tests/test_dump_producer.py, including token-exact seed-42
code parity between the torch oracle and the JAX pipeline.
"""

import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "test_data" / "reference_values"


def _load_meta():
    meta_path = GOLDEN_DIR / "metadata.json"
    if not meta_path.exists():
        pytest.skip("no reference dumps (test_data/reference_values/metadata.json)")
    return json.loads(meta_path.read_text())


def _load_stage(meta, name):
    stage = meta["stages"].get(name)
    if stage is None:
        pytest.skip(f"stage {name} not dumped")
    dtype = np.dtype(stage.get("dtype", "float32"))
    data = np.fromfile(GOLDEN_DIR / stage["file"], dtype=dtype)
    return data.reshape(stage["shape"])


def _load_model(meta):
    model_dir = Path(meta["model_dir"])
    if not model_dir.exists():
        pytest.skip(f"checkpoint {model_dir} not present")
    from qwen3_tts_tpu.pipeline import Qwen3TTS

    return Qwen3TTS.from_pretrained(model_dir)


def _max_abs_diff(a, b):
    return float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())


def test_text_embedding_matches_reference():
    meta = _load_meta()
    golden = _load_stage(meta, "text_embedding")
    model = _load_model(meta)
    import jax.numpy as jnp

    ids = jnp.asarray(np.asarray(meta["input_ids"], np.int32))
    got = np.asarray(model.talker_params["text_embedding"][ids], np.float32)
    assert _max_abs_diff(got, golden) < 1e-2  # bf16 storage tolerance


def test_text_projection_matches_reference():
    meta = _load_meta()
    golden = _load_stage(meta, "text_projection")
    model = _load_model(meta)
    import jax.numpy as jnp

    from qwen3_tts_tpu.models import talker as TM

    ids = jnp.asarray(np.asarray(meta["input_ids"], np.int32))
    got = np.asarray(TM.embed_text(model.talker_params, ids), np.float32)
    assert _max_abs_diff(got, golden) < 5e-2


def test_talker_forward_matches_reference():
    """Full no-cache forward over input_ids -> codec logits (the reference's
    test_full_forward_28_layers gate, tolerance 1e-4 f32 / 1e-1 bf16)."""
    meta = _load_meta()
    golden = _load_stage(meta, "talker_forward")
    model = _load_model(meta)
    import jax.numpy as jnp

    from qwen3_tts_tpu.models import talker as TM
    from qwen3_tts_tpu.ops import nn

    ids = jnp.asarray(np.asarray(meta["input_ids"], np.int32))
    x = TM.embed_text(model.talker_params, ids)[None]
    tcfg = model.config.talker
    cache = nn.init_kv_cache(tcfg.layer_stack(), 1, x.shape[1], x.dtype)
    h, _ = TM.forward(
        model.talker_params, tcfg, x, cache,
        jnp.arange(x.shape[1], dtype=jnp.int32), jnp.int32(0),
    )
    logits = np.asarray(TM.codec_logits(model.talker_params, h)[0], np.float32)
    assert _max_abs_diff(logits, golden) < 0.15


def test_vocoder_matches_reference():
    meta = _load_meta()
    codes = _load_stage(meta, "codes")
    golden = _load_stage(meta, "vocoder_waveform")
    model = _load_model(meta)

    audio = model.decode_codes(codes.astype(np.int32))
    assert _max_abs_diff(audio.samples[: len(golden)], golden) < 1e-3
