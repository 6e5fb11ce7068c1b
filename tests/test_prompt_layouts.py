"""Row-by-row verification of the variant prompt layouts.

Independently reconstructs each position of the CustomVoice (10 rows,
talker.rs:451-491), VoiceClone (10/9 rows, talker.rs:511-563), and
VoiceDesign (9 suffix rows, talker.rs:585-626) prompt embeddings and
compares against the builders.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.models import talker, weights as W, tokens as T
from qwen3_tts_tpu.models.config import TalkerConfig

CFG = TalkerConfig(
    text_embed_dim=16,
    hidden_size=32,
    text_proj_intermediate=16,
    intermediate_size=64,
    num_hidden_layers=1,
    num_attention_heads=2,
    num_key_value_heads=1,
    head_dim=16,
)
PARAMS = W.init_talker_params(jax.random.PRNGKey(3), CFG, jnp.float32)

SPK = T.SPEAKERS["serena"].token_id
LANG = T.LANGUAGES["japanese"]
FIRST_TEXT = jnp.int32(123)


def tproj(ids):
    return np.asarray(talker.embed_text(PARAMS, jnp.asarray(ids, jnp.int32)))


def cemb(ids):
    return np.asarray(talker.embed_codec(PARAMS, jnp.asarray(ids, jnp.int32)))


def test_custom_voice_layout():
    got = np.asarray(
        talker.build_custom_voice_prompt(PARAMS, FIRST_TEXT, SPK, LANG)
    )[0]
    assert got.shape[0] == 10

    role = tproj([T.IM_START, T.ASSISTANT, T.NEWLINE])
    np.testing.assert_allclose(got[:3], role, atol=1e-5)

    overlay_text = tproj([T.TTS_PAD] * 5 + [T.TTS_BOS])
    codec = cemb([T.CODEC_THINK, T.CODEC_THINK_BOS, LANG, T.CODEC_THINK_EOS, SPK, T.CODEC_PAD])
    np.testing.assert_allclose(got[3:9], overlay_text + codec, atol=1e-5)

    first = tproj([int(FIRST_TEXT)]) + cemb([T.CODEC_BOS])
    np.testing.assert_allclose(got[9:10], first, atol=1e-5)


def test_voice_clone_layout_xvector():
    xvec = jnp.asarray(np.random.RandomState(0).randn(CFG.hidden_size).astype(np.float32))
    got = np.asarray(
        talker.build_voice_clone_prompt(PARAMS, FIRST_TEXT, xvec, LANG, icl_mode=False)
    )[0]
    assert got.shape[0] == 10

    overlay_text = tproj([T.TTS_PAD] * 5 + [T.TTS_BOS])
    # Speaker slot (index 4 of the overlay) holds the continuous x-vector.
    codec = np.concatenate(
        [
            cemb([T.CODEC_THINK, T.CODEC_THINK_BOS, LANG, T.CODEC_THINK_EOS]),
            np.asarray(xvec)[None],
            cemb([T.CODEC_PAD]),
        ]
    )
    np.testing.assert_allclose(got[3:9], overlay_text + codec, atol=1e-5)
    np.testing.assert_allclose(
        got[9:10], tproj([int(FIRST_TEXT)]) + cemb([T.CODEC_BOS]), atol=1e-5
    )


def test_voice_clone_layout_icl_omits_first_text():
    xvec = jnp.zeros((CFG.hidden_size,), jnp.float32)
    got = talker.build_voice_clone_prompt(PARAMS, FIRST_TEXT, xvec, LANG, icl_mode=True)
    assert got.shape[1] == 9  # no first_text + codec_bos position


def test_voice_design_suffix_layout():
    got = np.asarray(talker.build_voice_design_suffix(PARAMS, FIRST_TEXT, LANG))
    assert got.shape[0] == 9

    role = tproj([T.IM_START, T.ASSISTANT, T.NEWLINE])
    np.testing.assert_allclose(got[:3], role, atol=1e-5)

    # VoiceDesign: 4 pads + bos over [think, think_bos, lang, think_eos, pad]
    overlay_text = tproj([T.TTS_PAD] * 4 + [T.TTS_BOS])
    codec = cemb([T.CODEC_THINK, T.CODEC_THINK_BOS, LANG, T.CODEC_THINK_EOS, T.CODEC_PAD])
    np.testing.assert_allclose(got[3:8], overlay_text + codec, atol=1e-5)
    np.testing.assert_allclose(
        got[8:9], tproj([int(FIRST_TEXT)]) + cemb([T.CODEC_BOS]), atol=1e-5
    )


def test_trailing_text_layout():
    ids = jnp.asarray([9, 8, 7, 6, 0, 0], jnp.int32)
    text_len = 4
    got = np.asarray(talker.build_trailing_text(PARAMS, ids, jnp.int32(text_len)))
    # rows 0..2 = tokens 8, 7, 6; row 3 = tts_eos; rows 4+ = tts_pad
    np.testing.assert_allclose(got[0:3], tproj([8, 7, 6]), atol=1e-5)
    np.testing.assert_allclose(got[3], tproj([T.TTS_EOS])[0], atol=1e-5)
    np.testing.assert_allclose(got[4], tproj([T.TTS_PAD])[0], atol=1e-5)
    np.testing.assert_allclose(got[5], tproj([T.TTS_PAD])[0], atol=1e-5)
