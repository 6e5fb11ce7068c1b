"""End-to-end test of the golden-dump producer + seed-42 code parity.

Runs ``scripts/dump_reference_values.py`` (the torch-oracle dump harness,
VERDICT round-1 item 2) against the synthetic HF checkpoint, then verifies
with the JAX pipeline that:

  1. every dumped stage matches the JAX computation within f32 tolerance
     (the same comparisons ``tests/test_reference_golden.py`` runs once real
     dumps exist), and
  2. **the generated [T, 16] code matrix is token-exact** — the BASELINE.json
     north star: the oracle's generation loop (prompt layout, trailing-text
     schedule, penalties, PCG-XSH-RR sampling, greedy code predictor) and
     the jitted while_loop pipeline produce identical codes at seed 42.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

import tests.test_checkpoint_loading as tc
import tests.test_fullstack_oracles as fso
from qwen3_tts_tpu.models.codec.encoder import MimiEncoderConfig
from qwen3_tts_tpu.pipeline import Qwen3TTS, SynthesisOptions

TEXT = "hello world"
SEED = 42
MAX_FRAMES = 6


def _make_ckpt(tmp_path):
    from safetensors.numpy import save_file
    from tokenizers.pre_tokenizers import ByteLevel

    root = tmp_path / "ckpt"
    (root / "speech_tokenizer").mkdir(parents=True)
    save_file(tc.build_model_weights(), root / "model.safetensors")
    save_file(
        tc.build_speech_tokenizer_weights(),
        root / "speech_tokenizer" / "model.safetensors",
    )
    (root / "config.json").write_text(json.dumps(tc.CONFIG_JSON))
    # Minimal byte-level BPE so producer and pipeline tokenize identically
    # (also exercises the vocab.json+merges.txt rebuild path).
    vocab = {ch: i for i, ch in enumerate(sorted(ByteLevel.alphabet()))}
    (root / "vocab.json").write_text(json.dumps(vocab))
    (root / "merges.txt").write_text("#version: 0.2\n")
    return root


def _mad(a, b) -> float:
    return float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())


@pytest.fixture(scope="module")
def dumped(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("dump")
    ckpt = _make_ckpt(tmp_path)
    out = tmp_path / "golden"
    vjson = tmp_path / "voc.json"
    vjson.write_text(
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
            }
        )
    )
    from scripts import dump_reference_values as DRV

    rc = DRV.main(
        [
            "--model-dir", str(ckpt),
            "--text", TEXT,
            "--seed", str(SEED),
            "--max-frames", str(MAX_FRAMES),
            "--out", str(out),
            "--vocoder-json", str(vjson),
        ]
    )
    assert rc == 0
    meta = json.loads((out / "metadata.json").read_text())

    mimi_cfg = MimiEncoderConfig(
        num_filters=tc.MIMI_FILTERS, ratios=tc.MIMI_RATIOS, hidden_size=tc.MIMI_HID,
        num_layers=2, num_heads=2, head_dim=8, intermediate_size=32,
        codebook_size=tc.CP_VOCAB, codebook_dim=8, num_quantizers=16,
        sliding_window=50,
    )
    model = Qwen3TTS.from_pretrained(
        ckpt, vocoder_config=fso.VCFG, mimi_config=mimi_cfg, dtype=jnp.float32
    )
    return meta, out, model


def _stage(meta, out, name):
    s = meta["stages"][name]
    return np.fromfile(out / s["file"], dtype=np.dtype(s.get("dtype", "float32"))).reshape(
        s["shape"]
    )


def test_metadata_and_tokens(dumped):
    meta, out, model = dumped
    assert meta["seed"] == SEED
    assert model.tokenizer.encode(TEXT) == meta["input_ids"]
    for name in ("text_embedding", "text_projection", "talker_forward", "codes",
                 "vocoder_waveform"):
        assert name in meta["stages"]
        assert (out / meta["stages"][name]["file"]).exists()


def test_dumped_stages_match_jax(dumped):
    """The same comparisons test_reference_golden.py makes against real dumps."""
    from qwen3_tts_tpu.models import talker as TM
    from qwen3_tts_tpu.ops import nn

    meta, out, model = dumped
    ids = jnp.asarray(np.asarray(meta["input_ids"], np.int32))

    golden = _stage(meta, out, "text_embedding")
    got = np.asarray(model.talker_params["text_embedding"][ids])
    assert _mad(got, golden) < 1e-6

    golden = _stage(meta, out, "text_projection")
    got = np.asarray(TM.embed_text(model.talker_params, ids))
    assert _mad(got, golden) < 1e-5

    golden = _stage(meta, out, "talker_forward")
    x = TM.embed_text(model.talker_params, ids)[None]
    tcfg = model.config.talker
    cache = nn.init_kv_cache(tcfg.layer_stack(), 1, x.shape[1], x.dtype)
    h, _ = TM.forward(
        model.talker_params, tcfg, x, cache,
        jnp.arange(x.shape[1], dtype=jnp.int32), jnp.int32(0),
    )
    got = np.asarray(TM.codec_logits(model.talker_params, h)[0])
    assert _mad(got, golden) < 1e-4


def test_code_parity_seed42(dumped):
    """North star: JAX pipeline codes == torch-oracle codes, token-exact."""
    meta, out, model = dumped
    golden_codes = _stage(meta, out, "codes")
    session = model.synthesize_streaming(
        TEXT, meta["speaker"], meta["language"],
        SynthesisOptions(max_length=MAX_FRAMES, seed=SEED),
    )
    frames = session.run_to_completion()
    np.testing.assert_array_equal(frames, golden_codes)


def test_vocoder_waveform_matches(dumped):
    meta, out, model = dumped
    codes = _stage(meta, out, "codes")
    golden = _stage(meta, out, "vocoder_waveform")
    audio = model.decode_codes(codes.astype(np.int32))
    assert _mad(audio.samples[: len(golden)], golden) < 1e-4
