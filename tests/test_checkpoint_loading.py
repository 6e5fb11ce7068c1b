"""End-to-end checkpoint loading test against a synthetic HF-format file.

Builds a tiny checkpoint with the exact HuggingFace key names and tensor
orientations the real Qwen3-TTS safetensors use (talker.*,
talker.code_predictor.*, speaker_encoder.*, decoder.*, encoder.*), writes
model.safetensors + config.json + speech_tokenizer/model.safetensors, then
drives Qwen3TTS.from_pretrained through tokenizer-less loading and full
synthesis. This is the guard against key-map/orientation regressions that
would otherwise only surface with real weights.
"""

import json

import numpy as np
import pytest

from qwen3_tts_tpu.pipeline import Qwen3TTS, SynthesisOptions, VoiceClonePrompt

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips


# Tiny but structurally-complete dimensions.
T_HID = 64
T_TEXT_DIM = 32
T_INTER = 96
T_LAYERS = 2
HEADS, KV, HD = 4, 2, 16
CP_HID = 64
CP_INTER = 64
CP_LAYERS = 2
CP_VOCAB = 128
TEXT_VOCAB = 151936
CODEC_VOCAB = 3072

V_CB_DIM = 16      # vocoder codebook_dim (proj out)
V_LATENT = 24
V_HID = 16
V_HEADS, V_HD = 2, 8
V_INTER = 32
V_EMB = 8          # codebook embed dim
V_DEC = 32
SE_CH = (24, 24, 24, 24, 48)
SE_DIM = T_HID     # enc_dim must equal talker hidden for voice-clone prompts
MIMI_FILTERS = 8
MIMI_RATIOS = (4, 3)
MIMI_HID = 16


def _rs(seed):
    return np.random.RandomState(seed)


def _lin(rs, out_dim, in_dim, scale=0.05):
    return (rs.randn(out_dim, in_dim) * scale).astype(np.float32)


def _vec(rs, dim):
    return (rs.randn(dim) * 0.02).astype(np.float32)


def build_model_weights() -> dict:
    rs = _rs(0)
    w = {}
    w["talker.model.text_embedding.weight"] = _lin(rs, TEXT_VOCAB, T_TEXT_DIM, 0.02)
    w["talker.text_projection.linear_fc1.weight"] = _lin(rs, T_TEXT_DIM, T_TEXT_DIM)
    w["talker.text_projection.linear_fc1.bias"] = _vec(rs, T_TEXT_DIM)
    w["talker.text_projection.linear_fc2.weight"] = _lin(rs, T_HID, T_TEXT_DIM)
    w["talker.text_projection.linear_fc2.bias"] = _vec(rs, T_HID)
    w["talker.model.codec_embedding.weight"] = _lin(rs, CODEC_VOCAB, T_HID, 0.02)
    w["talker.model.norm.weight"] = np.ones(T_HID, np.float32)
    w["talker.codec_head.weight"] = _lin(rs, CODEC_VOCAB, T_HID)

    def layer(prefix, hid, inter):
        w[f"{prefix}.self_attn.q_proj.weight"] = _lin(rs, HEADS * HD, hid)
        w[f"{prefix}.self_attn.k_proj.weight"] = _lin(rs, KV * HD, hid)
        w[f"{prefix}.self_attn.v_proj.weight"] = _lin(rs, KV * HD, hid)
        w[f"{prefix}.self_attn.o_proj.weight"] = _lin(rs, hid, HEADS * HD)
        w[f"{prefix}.self_attn.q_norm.weight"] = np.ones(HD, np.float32)
        w[f"{prefix}.self_attn.k_norm.weight"] = np.ones(HD, np.float32)
        w[f"{prefix}.input_layernorm.weight"] = np.ones(hid, np.float32)
        w[f"{prefix}.post_attention_layernorm.weight"] = np.ones(hid, np.float32)
        w[f"{prefix}.mlp.gate_proj.weight"] = _lin(rs, inter, hid)
        w[f"{prefix}.mlp.up_proj.weight"] = _lin(rs, inter, hid)
        w[f"{prefix}.mlp.down_proj.weight"] = _lin(rs, hid, inter)

    for i in range(T_LAYERS):
        layer(f"talker.model.layers.{i}", T_HID, T_INTER)

    cp = "talker.code_predictor"
    for i in range(15):
        w[f"{cp}.model.codec_embedding.{i}.weight"] = _lin(rs, CP_VOCAB, T_HID, 0.02)
        w[f"{cp}.lm_head.{i}.weight"] = _lin(rs, CP_VOCAB, CP_HID)
    for i in range(CP_LAYERS):
        layer(f"{cp}.model.layers.{i}", CP_HID, CP_INTER)
    w[f"{cp}.model.norm.weight"] = np.ones(CP_HID, np.float32)

    # Speaker encoder (ECAPA), mel_dim 128 standard.
    se = "speaker_encoder"
    mel_dim = 128

    def se_conv(key, cout, cin, k):
        w[f"{key}.weight"] = _lin(rs, cout, cin * k).reshape(cout, cin, k)
        w[f"{key}.bias"] = _vec(rs, cout)

    se_conv(f"{se}.blocks.0.conv", SE_CH[0], mel_dim, 5)
    scale = 8  # production res2net scale (default SpeakerEncoderConfig)
    chunk = SE_CH[1] // scale
    for i in range(1, 4):
        bp = f"{se}.blocks.{i}"
        se_conv(f"{bp}.tdnn1.conv", SE_CH[i], SE_CH[i], 1)
        for j in range(scale - 1):
            se_conv(f"{bp}.res2net_block.blocks.{j}.conv", chunk, chunk, 3)
        se_conv(f"{bp}.tdnn2.conv", SE_CH[i], SE_CH[i], 1)
        se_conv(f"{bp}.se_block.conv1", 8, SE_CH[i], 1)
        se_conv(f"{bp}.se_block.conv2", SE_CH[i], 8, 1)
    se_conv(f"{se}.mfa.conv", SE_CH[4], sum(SE_CH[1:4]), 1)
    se_conv(f"{se}.asp.tdnn.conv", 8, SE_CH[4] * 3, 1)
    se_conv(f"{se}.asp.conv", SE_CH[4], 8, 1)
    se_conv(f"{se}.fc", SE_DIM, SE_CH[4] * 2, 1)
    return w


def build_speech_tokenizer_weights() -> dict:
    rs = _rs(1)
    w = {}

    # ---- decoder (vocoder) ----
    def conv(key, cout, cin, k):
        w[f"{key}.weight"] = _lin(rs, cout, cin * k).reshape(cout, cin, k)
        w[f"{key}.bias"] = _vec(rs, cout)

    def tconv(key, cin, cout, k):
        w[f"{key}.weight"] = _lin(rs, cin, cout * k).reshape(cin, cout, k)
        w[f"{key}.bias"] = _vec(rs, cout)

    w["decoder.quantizer.rvq_first.vq.layers.0._codebook.embedding_sum"] = _lin(
        rs, 2048, V_EMB, 1.0
    )
    w["decoder.quantizer.rvq_first.vq.layers.0._codebook.cluster_usage"] = np.ones(
        2048, np.float32
    )
    for i in range(15):
        w[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.embedding_sum"] = _lin(
            rs, 2048, V_EMB, 1.0
        )
        w[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.cluster_usage"] = np.ones(
            2048, np.float32
        )
    w["decoder.quantizer.rvq_first.output_proj.weight"] = _lin(rs, V_CB_DIM, V_EMB).reshape(
        V_CB_DIM, V_EMB, 1
    )
    w["decoder.quantizer.rvq_rest.output_proj.weight"] = _lin(rs, V_CB_DIM, V_EMB).reshape(
        V_CB_DIM, V_EMB, 1
    )
    conv("decoder.pre_conv.conv", V_LATENT, V_CB_DIM, 3)
    w["decoder.pre_transformer.input_proj.weight"] = _lin(rs, V_HID, V_LATENT)
    w["decoder.pre_transformer.input_proj.bias"] = _vec(rs, V_HID)
    w["decoder.pre_transformer.output_proj.weight"] = _lin(rs, V_LATENT, V_HID)
    w["decoder.pre_transformer.output_proj.bias"] = _vec(rs, V_LATENT)
    w["decoder.pre_transformer.norm.weight"] = np.ones(V_HID, np.float32)
    for i in range(2):
        p = f"decoder.pre_transformer.layers.{i}"
        w[f"{p}.input_layernorm.weight"] = np.ones(V_HID, np.float32)
        w[f"{p}.self_attn.q_proj.weight"] = _lin(rs, V_HEADS * V_HD, V_HID)
        w[f"{p}.self_attn.k_proj.weight"] = _lin(rs, V_HEADS * V_HD, V_HID)
        w[f"{p}.self_attn.v_proj.weight"] = _lin(rs, V_HEADS * V_HD, V_HID)
        w[f"{p}.self_attn.o_proj.weight"] = _lin(rs, V_HID, V_HEADS * V_HD)
        w[f"{p}.self_attn_layer_scale.scale"] = np.full(V_HID, 0.01, np.float32)
        w[f"{p}.post_attention_layernorm.weight"] = np.ones(V_HID, np.float32)
        w[f"{p}.mlp.gate_proj.weight"] = _lin(rs, V_INTER, V_HID)
        w[f"{p}.mlp.up_proj.weight"] = _lin(rs, V_INTER, V_HID)
        w[f"{p}.mlp.down_proj.weight"] = _lin(rs, V_HID, V_INTER)
        w[f"{p}.mlp_layer_scale.scale"] = np.full(V_HID, 0.01, np.float32)
    for i, ratio in enumerate((2, 2)):
        p = f"decoder.upsample.{i}"
        tconv(f"{p}.0.conv", V_LATENT, V_LATENT, 2 * ratio)
        w[f"{p}.1.dwconv.conv.weight"] = (_rs(10 + i).randn(V_LATENT, 1, 7) * 0.05).astype(
            np.float32
        )
        w[f"{p}.1.dwconv.conv.bias"] = _vec(rs, V_LATENT)
        w[f"{p}.1.norm.weight"] = np.ones(V_LATENT, np.float32)
        w[f"{p}.1.norm.bias"] = np.zeros(V_LATENT, np.float32)
        w[f"{p}.1.pwconv1.weight"] = _lin(rs, 4 * V_LATENT, V_LATENT)
        w[f"{p}.1.pwconv1.bias"] = _vec(rs, 4 * V_LATENT)
        w[f"{p}.1.pwconv2.weight"] = _lin(rs, V_LATENT, 4 * V_LATENT)
        w[f"{p}.1.pwconv2.bias"] = _vec(rs, V_LATENT)
        w[f"{p}.1.gamma"] = np.ones(V_LATENT, np.float32)
    conv("decoder.decoder.0.conv", V_DEC, V_LATENT, 7)
    ch = V_DEC
    for i, rate in enumerate((8, 5, 4, 3)):
        bp = f"decoder.decoder.{i + 1}.block"
        out_ch = ch // 2
        w[f"{bp}.0.alpha"] = np.zeros(ch, np.float32)
        w[f"{bp}.0.beta"] = np.zeros(ch, np.float32)
        tconv(f"{bp}.1.conv", ch, out_ch, 2 * rate)
        for u in (2, 3, 4):
            up = f"{bp}.{u}"
            w[f"{up}.act1.alpha"] = np.zeros(out_ch, np.float32)
            w[f"{up}.act1.beta"] = np.zeros(out_ch, np.float32)
            conv(f"{up}.conv1.conv", out_ch, out_ch, 7)
            w[f"{up}.act2.alpha"] = np.zeros(out_ch, np.float32)
            w[f"{up}.act2.beta"] = np.zeros(out_ch, np.float32)
            conv(f"{up}.conv2.conv", out_ch, out_ch, 1)
        ch = out_ch
    w["decoder.decoder.5.alpha"] = np.zeros(ch, np.float32)
    w["decoder.decoder.5.beta"] = np.zeros(ch, np.float32)
    conv("decoder.decoder.6.conv", 1, ch, 7)

    # ---- encoder (Mimi) ----
    def mconv(key, cout, cin, k, bias=True):
        w[f"{key}.weight"] = _lin(rs, cout, cin * k).reshape(cout, cin, k)
        if bias:
            w[f"{key}.bias"] = _vec(rs, cout)

    e = "encoder"
    mconv(f"{e}.encoder.layers.0.conv", MIMI_FILTERS, 1, 7)
    chn = MIMI_FILTERS
    for i, _ratio in enumerate(reversed(MIMI_RATIOS)):
        hidden = chn // 2
        mconv(f"{e}.encoder.layers.{3 * i + 1}.block.1.conv", hidden, chn, 3)
        mconv(f"{e}.encoder.layers.{3 * i + 1}.block.3.conv", chn, hidden, 1)
        mconv(f"{e}.encoder.layers.{3 * i + 3}.conv", chn * 2, chn, 2 * _ratio)
        chn *= 2
    mconv(f"{e}.encoder.layers.{3 * len(MIMI_RATIOS) + 2}.conv", MIMI_HID, chn, 3)
    for i in range(2):
        lp = f"{e}.encoder_transformer.layers.{i}"
        w[f"{lp}.input_layernorm.weight"] = np.ones(MIMI_HID, np.float32)
        w[f"{lp}.input_layernorm.bias"] = np.zeros(MIMI_HID, np.float32)
        w[f"{lp}.self_attn.q_proj.weight"] = _lin(rs, MIMI_HID, MIMI_HID)
        w[f"{lp}.self_attn.k_proj.weight"] = _lin(rs, MIMI_HID, MIMI_HID)
        w[f"{lp}.self_attn.v_proj.weight"] = _lin(rs, MIMI_HID, MIMI_HID)
        w[f"{lp}.self_attn.o_proj.weight"] = _lin(rs, MIMI_HID, MIMI_HID)
        w[f"{lp}.self_attn_layer_scale.scale"] = np.full(MIMI_HID, 0.01, np.float32)
        w[f"{lp}.post_attention_layernorm.weight"] = np.ones(MIMI_HID, np.float32)
        w[f"{lp}.post_attention_layernorm.bias"] = np.zeros(MIMI_HID, np.float32)
        w[f"{lp}.mlp.fc1.weight"] = _lin(rs, 32, MIMI_HID)
        w[f"{lp}.mlp.fc2.weight"] = _lin(rs, MIMI_HID, 32)
        w[f"{lp}.mlp_layer_scale.scale"] = np.full(MIMI_HID, 0.01, np.float32)
    w[f"{e}.downsample.conv.weight"] = _lin(rs, MIMI_HID, MIMI_HID * 4).reshape(
        MIMI_HID, MIMI_HID, 4
    )
    for q, name in [(1, "semantic"), (15, "acoustic")]:
        qp = f"{e}.quantizer.{name}_residual_vector_quantizer"
        w[f"{qp}.input_proj.weight"] = _lin(rs, 8, MIMI_HID).reshape(8, MIMI_HID, 1)
        w[f"{qp}.output_proj.weight"] = _lin(rs, MIMI_HID, 8).reshape(MIMI_HID, 8, 1)
        for i in range(q):
            w[f"{qp}.layers.{i}.codebook.embed_sum"] = _lin(rs, CP_VOCAB, 8, 1.0)
            w[f"{qp}.layers.{i}.codebook.cluster_usage"] = np.ones(CP_VOCAB, np.float32)
    return w


CONFIG_JSON = {
    "tts_model_type": "base",
    "tts_model_size": "0b6",
    "talker_config": {
        "hidden_size": T_HID,
        "intermediate_size": T_INTER,
        "num_hidden_layers": T_LAYERS,
        "num_attention_heads": HEADS,
        "num_key_value_heads": KV,
        "head_dim": HD,
        "vocab_size": CODEC_VOCAB,
        "text_vocab_size": TEXT_VOCAB,
        "text_hidden_size": T_TEXT_DIM,
        "rope_scaling": {"mrope_section": [24, 20, 20]},
        "code_predictor_config": {
            "hidden_size": CP_HID,
            "intermediate_size": CP_INTER,
            "num_hidden_layers": CP_LAYERS,
            "num_attention_heads": HEADS,
            "num_key_value_heads": KV,
            "head_dim": HD,
            "vocab_size": CP_VOCAB,
            "num_code_groups": 16,
        },
    },
    "speaker_encoder_config": {"enc_dim": SE_DIM, "sample_rate": 24000},
}


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    root = tmp_path_factory.mktemp("ckpt")
    save_file(build_model_weights(), root / "model.safetensors")
    (root / "speech_tokenizer").mkdir()
    save_file(
        build_speech_tokenizer_weights(),
        root / "speech_tokenizer" / "model.safetensors",
    )
    (root / "config.json").write_text(json.dumps(CONFIG_JSON))
    # minimal tokenizer.json would be complex; use a stub tokenizer instead
    return root


class StubTokenizer:
    def encode(self, text):
        return [5 + (ord(c) % 40) for c in text[:10]] or [5]


def _load(checkpoint_dir):
    from qwen3_tts_tpu.models.codec.encoder import MimiEncoderConfig
    from qwen3_tts_tpu.models.codec.vocoder import VocoderConfig

    import qwen3_tts_tpu.pipeline as pl

    vocoder_cfg = VocoderConfig(
        codebook_dim=V_CB_DIM, latent_dim=V_LATENT, hidden_size=V_HID, num_layers=2,
        num_heads=V_HEADS, head_dim=V_HD, intermediate_size=V_INTER,
        codebook_embed_dim=V_EMB, decoder_dim=V_DEC,
    )
    mimi_cfg = MimiEncoderConfig(
        num_filters=MIMI_FILTERS, ratios=MIMI_RATIOS, hidden_size=MIMI_HID,
        num_layers=2, num_heads=2, head_dim=8, intermediate_size=32,
        codebook_size=CP_VOCAB, codebook_dim=8, num_quantizers=16, sliding_window=50,
    )

    # Patch tokenizer resolution (no tokenizer.json in the synthetic ckpt).
    orig = pl.TextTokenizer.from_pretrained
    pl.TextTokenizer.from_pretrained = staticmethod(lambda *_a, **_k: StubTokenizer())
    try:
        return Qwen3TTS.from_pretrained(
            checkpoint_dir, vocoder_config=vocoder_cfg, mimi_config=mimi_cfg
        )
    finally:
        pl.TextTokenizer.from_pretrained = orig


def test_from_pretrained_loads_and_synthesizes(checkpoint_dir):
    model = _load(checkpoint_dir)
    assert model.config.label == "0.6B Base"
    assert model.supports_voice_cloning()
    opts = SynthesisOptions(max_length=6, seed=42)
    audio, timing = model.synthesize_with_timing("hello", "ryan", "english", opts)
    assert timing.generation_frames > 0
    assert len(audio) == timing.generation_frames * 1920


def test_voice_clone_from_checkpoint(checkpoint_dir):
    model = _load(checkpoint_dir)
    samples = np.sin(np.linspace(0, 400, 4800)).astype(np.float32)
    from qwen3_tts_tpu.audio.io import AudioBuffer

    prompt = model.create_voice_clone_prompt(AudioBuffer(samples, 24000), ref_text="hi")
    assert prompt.speaker_embedding.shape == (SE_DIM,)
    assert prompt.ref_codes is not None and prompt.ref_codes.shape[1] == 16
    audio = model.synthesize_voice_clone(
        "cloned", prompt, "english", SynthesisOptions(max_length=6, seed=1)
    )
    assert len(audio) > 0
