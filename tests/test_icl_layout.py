"""ICL prompt layout verification against independent reconstruction.

The ICL builders are the most intricate parity logic (overlay vs sequential
layouts, trailing extraction, padding-with-garbage invariants,
talker.rs:646-710). These tests recompute every row straightforwardly with
eager indexing and compare against the bucketed/jitted builders.
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


def setup():
    params = W.init_talker_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    text = [11, 22, 33, 44, 55]  # ref(2) + target(2) + tts_eos
    n_text = len(text)
    tb = 8
    text_arr = np.zeros(tb, np.int32)
    text_arr[:n_text] = text
    t_ref = 3
    rs = np.random.RandomState(1)
    codec_rows_true = jnp.asarray(rs.randn(t_ref + 1, CFG.hidden_size).astype(np.float32))
    cb = 8
    codec_padded = jnp.zeros((cb, CFG.hidden_size))
    codec_padded = codec_padded.at[: t_ref + 1].set(codec_rows_true)
    return params, jnp.asarray(text_arr), n_text, codec_padded, codec_rows_true, t_ref + 1


def test_overlay_icl_rows():
    params, text_ids, n_text, codec_padded, codec_true, n_codec = setup()
    rows, trailing, trailing_len = talker.build_icl_rows(
        params, text_ids, jnp.int32(n_text), codec_padded, jnp.int32(n_codec)
    )
    text_emb = np.asarray(talker.embed_text(params, text_ids))
    pad = np.asarray(talker.tts_pad_embed(params))[0]
    got = np.asarray(rows)[0]
    codec_np = np.asarray(codec_true)

    # Row i (i < n_codec): codec[i] + (text[i] if i < n_text else tts_pad).
    for i in range(n_codec):
        text_part = text_emb[i] if i < n_text else pad
        np.testing.assert_allclose(got[i], codec_np[i] + text_part, atol=1e-5)

    # Trailing: text tokens beyond the codec length.
    assert int(trailing_len) == n_text - n_codec == 1
    np.testing.assert_allclose(
        np.asarray(trailing)[0], text_emb[n_codec], atol=1e-5
    )
    # Rows past trailing_len are tts_pad.
    np.testing.assert_allclose(np.asarray(trailing)[1], pad, atol=1e-5)


def test_overlay_icl_text_shorter_than_codec():
    """n_text < n_codec: overlay pads text with tts_pad; trailing empty."""
    params, text_ids, _, codec_padded, codec_true, n_codec = setup()
    n_text = 2  # shorter than n_codec = 4
    rows, trailing, trailing_len = talker.build_icl_rows(
        params, text_ids, jnp.int32(n_text), codec_padded, jnp.int32(n_codec)
    )
    text_emb = np.asarray(talker.embed_text(params, text_ids))
    pad = np.asarray(talker.tts_pad_embed(params))[0]
    got = np.asarray(rows)[0]
    for i in range(n_codec):
        text_part = text_emb[i] if i < n_text else pad
        np.testing.assert_allclose(
            got[i], np.asarray(codec_true)[i] + text_part, atol=1e-5
        )
    assert int(trailing_len) == 0


def test_sequential_icl_rows():
    params, text_ids, n_text, codec_padded, codec_true, n_codec = setup()
    rows, trailing, trailing_len = talker.build_icl_rows_sequential(
        params, text_ids, jnp.int32(n_text), codec_padded, jnp.int32(n_codec)
    )
    text_emb = np.asarray(talker.embed_text(params, text_ids))
    pad = np.asarray(talker.tts_pad_embed(params))[0]
    codec_pad = np.asarray(
        talker.embed_codec(params, jnp.array([T.CODEC_PAD], jnp.int32))
    )[0]
    got = np.asarray(rows)[0]

    # Block 1: text rows + codec_pad overlay.
    for i in range(n_text):
        np.testing.assert_allclose(got[i], text_emb[i] + codec_pad, atol=1e-5)
    # Block 2: codec rows + tts_pad overlay, starting exactly at n_text.
    for j in range(n_codec):
        np.testing.assert_allclose(
            got[n_text + j], np.asarray(codec_true)[j] + pad, atol=1e-5
        )
    assert int(trailing_len) == 0
