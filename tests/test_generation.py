"""Generation-core tests on tiny random models (weight-free, CPU).

Key invariants:
* same seed -> identical frames (full determinism),
* chunked streaming re-entry produces frames identical to one-shot,
* acoustic codes in-range; semantic tokens never in the suppressed range.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tts_tpu.generation import core
from qwen3_tts_tpu.models import talker, tokens as T, weights
from qwen3_tts_tpu.models.config import CodePredictorConfig, TalkerConfig
from qwen3_tts_tpu.ops import nn, rng, sampling

MAX_NEW = 12


def tiny_configs(with_projection: bool = False):
    tcfg = TalkerConfig(
        text_embed_dim=32,
        hidden_size=64,
        text_proj_intermediate=32,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
    )
    cpcfg = CodePredictorConfig(
        hidden_size=32 if with_projection else 64,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        vocab_size=128,
        codec_embed_dim=64 if with_projection else None,
    )
    return tcfg, cpcfg


def make_models(with_projection: bool = False, dtype=jnp.float32):
    tcfg, cpcfg = tiny_configs(with_projection)
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    tp = weights.init_talker_params(k1, tcfg, dtype)
    cpp = weights.init_code_predictor_params(k2, cpcfg, dtype)
    return tp, cpp, tcfg, cpcfg


def run_generation(tp, cpp, tcfg, cpcfg, seed=42, chunks=None, max_new=MAX_NEW):
    scfg = sampling.SamplingConfig()
    text_ids = jnp.array([5, 17, 99, 3, 8, 0, 0, 0], dtype=jnp.int32)
    text_len = jnp.int32(5)

    prompt = talker.build_custom_voice_prompt(
        tp, text_ids[0], T.SPEAKERS["ryan"].token_id, T.LANGUAGES["english"]
    )
    pb = prompt.shape[1]
    cache = nn.init_kv_cache(tcfg.layer_stack(), 1, pb + max_new + 4, prompt.dtype)
    uniforms = jnp.asarray(rng.pcg_uniform_sequence(seed, max_new + 1))

    state = core.prefill_and_start(
        tp, tcfg, scfg, prompt, jnp.int32(pb), cache, uniforms, max_new
    )
    trailing = talker.build_trailing_text(tp, text_ids, text_len)
    pad = talker.tts_pad_embed(tp)[0]

    limits = chunks if chunks is not None else [max_new]
    for limit in limits:
        state = core.generate_frames_jit(
            tp, cpp, tcfg, cpcfg, scfg, state,
            trailing, text_len, pad, uniforms, jnp.int32(limit),
        )
    return np.asarray(state.frames), int(state.frame_idx)


@pytest.mark.parametrize("with_projection", [False, True])
def test_generation_shapes_and_ranges(with_projection):
    tp, cpp, tcfg, cpcfg = make_models(with_projection)
    frames, n = run_generation(tp, cpp, tcfg, cpcfg)
    assert frames.shape == (MAX_NEW, 16)
    assert 0 < n <= MAX_NEW
    valid = frames[:n]
    # acoustic codes within CP vocab
    assert (valid[:, 1:] >= 0).all() and (valid[:, 1:] < cpcfg.vocab_size).all()
    # semantic tokens outside suppressed control range (EOS never stored)
    sem = valid[:, 0]
    assert ((sem < 2048) | (sem == T.CODEC_EOS)).all()
    assert (sem != T.CODEC_EOS).all()


def test_generation_deterministic():
    tp, cpp, tcfg, cpcfg = make_models()
    f1, n1 = run_generation(tp, cpp, tcfg, cpcfg, seed=42)
    f2, n2 = run_generation(tp, cpp, tcfg, cpcfg, seed=42)
    assert n1 == n2
    np.testing.assert_array_equal(f1, f2)


def test_different_seed_differs():
    tp, cpp, tcfg, cpcfg = make_models()
    f1, n1 = run_generation(tp, cpp, tcfg, cpcfg, seed=42)
    f2, n2 = run_generation(tp, cpp, tcfg, cpcfg, seed=43)
    assert (n1 != n2) or not np.array_equal(f1[:n1, 0], f2[:n2, 0])


def test_eos_respects_min_new_tokens():
    """A head that always prefers EOS must still emit min_new_tokens frames,
    then stop (EOS blocked while token_count < min_new_tokens, then allowed)."""
    tp, cpp, tcfg, cpcfg = make_models()
    # Rig the codec head: EOS column hugely positive, everything else ~0.
    head = jnp.zeros_like(tp["codec_head"])
    head = head.at[:, T.CODEC_EOS].set(50.0)
    head = head.at[:, 7].set(1.0)  # deterministic runner-up
    tp = dict(tp, codec_head=head)

    scfg = sampling.SamplingConfig(temperature=0.001, min_new_tokens=2)  # greedy
    text_ids = jnp.array([5, 17, 0, 0, 0, 0, 0, 0], dtype=jnp.int32)
    prompt = talker.build_custom_voice_prompt(
        tp, text_ids[0], T.SPEAKERS["ryan"].token_id, T.LANGUAGES["english"]
    )
    cache = nn.init_kv_cache(tcfg.layer_stack(), 1, prompt.shape[1] + MAX_NEW + 4, prompt.dtype)
    uniforms = jnp.asarray(rng.pcg_uniform_sequence(42, MAX_NEW + 1))
    state = core.prefill_and_start(
        tp, tcfg, scfg, prompt, jnp.int32(prompt.shape[1]), cache, uniforms, MAX_NEW
    )
    trailing = talker.build_trailing_text(tp, text_ids, jnp.int32(2))
    pad = talker.tts_pad_embed(tp)[0]
    state = core.generate_frames_jit(
        tp, cpp, tcfg, cpcfg, scfg, state, trailing, jnp.int32(2), pad, uniforms,
        jnp.int32(MAX_NEW),
    )
    # Samples: #0 (count 0, EOS blocked -> 7), #1 (count 1, blocked -> 7),
    # #2 (count 2, EOS allowed -> 2150, no frame emitted for it).
    assert int(state.frame_idx) == 2
    assert bool(state.done)
    # the two emitted frames carry non-EOS semantic tokens
    sem = np.asarray(state.frames[:2, 0])
    assert (sem != T.CODEC_EOS).all()


def test_chunked_reentry_matches_oneshot():
    """Streaming chunk re-entry must reproduce one-shot frames exactly."""
    tp, cpp, tcfg, cpcfg = make_models()
    f_once, n_once = run_generation(tp, cpp, tcfg, cpcfg, seed=42)
    f_chunk, n_chunk = run_generation(
        tp, cpp, tcfg, cpcfg, seed=42, chunks=[3, 6, 9, MAX_NEW]
    )
    assert n_once == n_chunk
    np.testing.assert_array_equal(f_once, f_chunk)
