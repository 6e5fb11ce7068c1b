"""Full-stack numeric cross-checks vs the independent torch oracle.

VERDICT round-1 items 2+3: the vocoder and speaker-encoder end-to-end
numerics previously rested on skipped golden tests; here the complete
pipelines (talker forward, code-predictor frame, Decoder12Hz RVQ-de-embed →
pre-transformer → upsample → BigVGAN, ECAPA mel → x-vector) are compared
against ``scripts/torch_oracle.py`` — an independent PyTorch transcription
loading the same HF safetensors keys — on the synthetic checkpoint weights.
This mirrors the reference's stage-by-stage torch-oracle philosophy
(/root/reference/tests/reference_validation.rs:155-3003) without needing
weight downloads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tests.test_checkpoint_loading as tc
from qwen3_tts_tpu.models import code_predictor as cp_mod
from qwen3_tts_tpu.models import talker as TM
from qwen3_tts_tpu.models import weights as W
from qwen3_tts_tpu.models.codec import vocoder
from qwen3_tts_tpu.models.config import (
    CodePredictorConfig,
    SpeakerEncoderConfig,
    TalkerConfig,
)
from qwen3_tts_tpu.models.speaker import SpeakerEncoder
from qwen3_tts_tpu.ops import nn
from scripts import torch_oracle as TO

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips


TCFG = TalkerConfig(
    text_embed_dim=tc.T_TEXT_DIM,
    hidden_size=tc.T_HID,
    text_proj_intermediate=tc.T_TEXT_DIM,
    intermediate_size=tc.T_INTER,
    num_hidden_layers=tc.T_LAYERS,
    num_attention_heads=tc.HEADS,
    num_key_value_heads=tc.KV,
    head_dim=tc.HD,
)
CPCFG = CodePredictorConfig(
    hidden_size=tc.CP_HID,
    intermediate_size=tc.CP_INTER,
    num_hidden_layers=tc.CP_LAYERS,
    num_attention_heads=tc.HEADS,
    num_key_value_heads=tc.KV,
    head_dim=tc.HD,
    vocab_size=tc.CP_VOCAB,
)
VCFG = vocoder.VocoderConfig(
    codebook_dim=tc.V_CB_DIM,
    latent_dim=tc.V_LATENT,
    hidden_size=tc.V_HID,
    num_layers=2,
    num_heads=tc.V_HEADS,
    head_dim=tc.V_HD,
    intermediate_size=tc.V_INTER,
    codebook_embed_dim=tc.V_EMB,
    decoder_dim=tc.V_DEC,
)
SECFG = SpeakerEncoderConfig(
    mel_dim=128,
    enc_dim=tc.SE_DIM,
    enc_channels=tc.SE_CH,
    enc_attention_channels=8,
    enc_se_channels=8,
)


@pytest.fixture(scope="module")
def weights():
    return tc.build_model_weights()


@pytest.fixture(scope="module")
def st_weights():
    return tc.build_speech_tokenizer_weights()


def _mad(a, b) -> float:
    return float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())


def test_text_embedding_and_projection(weights):
    jp = W.load_talker_params(weights, TCFG, jnp.float32)
    oracle = TO.TalkerOracle(weights, TCFG)
    ids = np.array([3, 99, 151643, 77091, 198], np.int32)
    got = TM.embed_text(jp, jnp.asarray(ids))
    want = oracle.embed_text(ids)
    assert _mad(got, want) < 1e-5


def test_talker_forward_full_stack(weights):
    """Full causal forward (embed -> L layers -> norm -> codec head)."""
    jp = W.load_talker_params(weights, TCFG, jnp.float32)
    oracle = TO.TalkerOracle(weights, TCFG)
    ids = np.array([10, 20, 30, 40, 50, 60, 70], np.int32)

    emb_j = TM.embed_text(jp, jnp.asarray(ids))[None]
    cache = nn.init_kv_cache(TCFG.layer_stack(), 1, len(ids), jnp.float32)
    h, _ = TM.forward(
        jp, TCFG, emb_j, cache, jnp.arange(len(ids), dtype=jnp.int32), jnp.int32(0)
    )
    logits_j = TM.codec_logits(jp, h)[0]

    emb_t = oracle.embed_text(ids)[None]
    logits_t = oracle.forward_logits(emb_t)[0]
    assert _mad(h[0], oracle.forward_hidden(emb_t)[0]) < 2e-5
    assert _mad(logits_j, logits_t) < 1e-4


def test_code_predictor_exact_codes(weights):
    jp = W.load_code_predictor_params(weights, CPCFG, jnp.float32)
    oracle = TO.CodePredictorOracle(weights, CPCFG)
    rs = np.random.RandomState(7)
    hidden = rs.randn(1, 1, tc.CP_HID).astype(np.float32) * 0.5
    semantic = rs.randn(1, 1, tc.CP_HID).astype(np.float32) * 0.5

    got = np.asarray(
        cp_mod.predict_acoustic_codes(jp, CPCFG, jnp.asarray(hidden), jnp.asarray(semantic))
    )
    import torch

    want = oracle.predict(torch.as_tensor(hidden), torch.as_tensor(semantic))
    np.testing.assert_array_equal(got, want)

    got_sum = np.asarray(cp_mod.acoustic_embedding_sum(jp, jnp.asarray(got)))
    want_sum = np.asarray(oracle.acoustic_embedding_sum(want))
    assert _mad(got_sum, want_sum) < 1e-5


def test_code_predictor_with_mtp_projection(weights):
    """1.7B-style CP (codec_embed_dim != hidden) incl. small_to_mtp_projection."""
    rs = np.random.RandomState(11)
    embed_dim = 80
    w = dict(weights)
    p = "talker.code_predictor"
    for i in range(15):
        w[f"{p}.model.codec_embedding.{i}.weight"] = (
            rs.randn(tc.CP_VOCAB, embed_dim).astype(np.float32) * 0.05
        )
    w[f"{p}.small_to_mtp_projection.weight"] = (
        rs.randn(tc.CP_HID, embed_dim).astype(np.float32) * 0.05
    )
    w[f"{p}.small_to_mtp_projection.bias"] = rs.randn(tc.CP_HID).astype(np.float32) * 0.05
    cfg = CodePredictorConfig(
        hidden_size=tc.CP_HID,
        intermediate_size=tc.CP_INTER,
        num_hidden_layers=tc.CP_LAYERS,
        num_attention_heads=tc.HEADS,
        num_key_value_heads=tc.KV,
        head_dim=tc.HD,
        vocab_size=tc.CP_VOCAB,
        codec_embed_dim=embed_dim,
    )
    assert cfg.needs_projection
    jp = W.load_code_predictor_params(w, cfg, jnp.float32)
    oracle = TO.CodePredictorOracle(w, cfg)
    hidden = rs.randn(1, 1, embed_dim).astype(np.float32) * 0.5
    semantic = rs.randn(1, 1, embed_dim).astype(np.float32) * 0.5

    got = np.asarray(
        cp_mod.predict_acoustic_codes(jp, cfg, jnp.asarray(hidden), jnp.asarray(semantic))
    )
    import torch

    want = oracle.predict(torch.as_tensor(hidden), torch.as_tensor(semantic))
    np.testing.assert_array_equal(got, want)


def test_vocoder_full_stack(st_weights):
    """Complete Decoder12Hz vs torch oracle, incl. semantic mod-2048 path."""
    jp = vocoder.load_vocoder_params(st_weights, VCFG)
    oracle = TO.VocoderOracle(st_weights, VCFG)
    rs = np.random.RandomState(3)
    t = 7
    codes = np.zeros((1, 16, t), np.int32)
    codes[:, 0, :] = rs.randint(0, 3072, t)  # semantic: exercises % 2048
    codes[:, 1:, :] = rs.randint(0, 2048, (1, 15, t))

    got = np.asarray(vocoder.decode(jp, VCFG, jnp.asarray(codes)))
    want = oracle.decode(codes)
    assert got.shape == want.shape == (1, t * VCFG.total_upsample)
    assert _mad(got, want) < 1e-4


def test_speaker_encoder_full_stack(weights):
    enc = SpeakerEncoder.from_weights(weights, SECFG)
    oracle = TO.SpeakerOracle(weights, SECFG)
    rs = np.random.RandomState(5)
    mel = rs.randn(1, 128, 60).astype(np.float32)

    from qwen3_tts_tpu.models.speaker import forward as se_forward

    got = np.asarray(se_forward(enc.params, SECFG, jnp.asarray(mel)))
    want = oracle.forward(mel)
    assert got.shape == want.shape == (1, tc.SE_DIM)
    assert _mad(got, want) < 1e-4


def test_speaker_encoder_end_to_end_from_audio(weights):
    """Full encode(): audio -> mel -> ECAPA, oracle fed the same mel."""
    enc = SpeakerEncoder.from_weights(weights, SECFG)
    oracle = TO.SpeakerOracle(weights, SECFG)
    rs = np.random.RandomState(9)
    audio = (rs.randn(24000) * 0.1).astype(np.float32)

    got = enc.encode(audio)
    mel = enc.mel.compute_for_speaker_encoder(audio)[None]
    want = oracle.forward(mel)[0]
    assert _mad(got, want) < 1e-4
