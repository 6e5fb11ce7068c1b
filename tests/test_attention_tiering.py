"""Tiered decode attention: exactness vs dense full-cache attention.

VERDICT r1 item 10 / journal R1.8: dense decode attention reads the whole
frame bucket every step (+1.6 ms/frame at the 2048 bucket). The tiered path
(ops/nn.py tiered_decode_attention) reads the smallest static window
covering the live prefix via lax.switch — results must be exact.
"""

import numpy as np

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.ops import nn
import pytest

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips



def test_tiers_cover_max_seq():
    assert nn.decode_attention_tiers(2314) == (256, 512, 1024, 2048, 2314)
    assert nn.decode_attention_tiers(600) == (256, 512, 600)
    assert nn.decode_attention_tiers(100) == (100,)


def test_tiered_equals_dense_all_positions():
    rs = np.random.RandomState(0)
    b, h, kv, d = 1, 4, 2, 8
    max_seq = 600
    q = jnp.asarray(rs.randn(b, 1, h, d).astype(np.float32))
    ck = jnp.asarray(rs.randn(b, max_seq, kv, d).astype(np.float32))
    cv = jnp.asarray(rs.randn(b, max_seq, kv, d).astype(np.float32))
    scale = 1.0 / d**0.5

    key_pos = jnp.arange(max_seq, dtype=jnp.int32)
    tiered = jax.jit(nn.tiered_decode_attention, static_argnames=("scale",))
    for pos in (0, 1, 255, 256, 257, 511, 512, 599):
        mask = (key_pos <= pos)[None, None, None, None, :]
        dense = nn.gqa_attention(q, ck, cv, mask, scale)
        got = tiered(q, ck, cv, mask, scale, pos=jnp.int32(pos))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(dense), rtol=0, atol=1e-6
        )


def test_generation_identical_with_and_without_tiering():
    """Full frame loop at a >512-row cache: tiered codes == dense codes."""
    from dataclasses import replace

    from qwen3_tts_tpu.generation import core, prefill
    from qwen3_tts_tpu.models import weights as W
    from qwen3_tts_tpu.models.config import CodePredictorConfig, TalkerConfig
    from qwen3_tts_tpu.ops import rng, sampling

    tcfg = TalkerConfig(
        text_embed_dim=16, hidden_size=32, text_proj_intermediate=16,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8,
    )
    cpcfg = CodePredictorConfig(
        hidden_size=32, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8, vocab_size=64,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    tparams = W.init_talker_params(k1, tcfg, jnp.float32)
    cparams = W.init_code_predictor_params(k2, cpcfg, jnp.float32)
    scfg = sampling.SamplingConfig()
    max_new = 6
    max_seq = 10 + 1024 + 8  # > 512 so tiering engages
    uniforms = jnp.asarray(rng.pcg_uniform_sequence(42, max_new + 1))
    text_ids = jnp.array([5, 9, 3, 0], jnp.int32)

    def run(cfg):
        cache = nn.init_kv_cache(cfg.layer_stack(), 1, max_seq, jnp.float32)
        state, trailing, tl, pad = prefill.custom_voice_impl(
            tparams, cfg, scfg, text_ids, jnp.int32(3), jnp.int32(3061),
            jnp.int32(2050), cache, uniforms, max_new,
        )
        final = core.generate_frames(
            tparams, cparams, cfg, cpcfg, scfg, state, trailing, tl, pad,
            uniforms, jnp.int32(max_new),
        )
        return np.asarray(final.frames), int(final.frame_idx)

    # Tiering is opt-in (measured slower on v5e, journal R2.2); correctness
    # of the primitive is still guaranteed when enabled.
    assert not tcfg.decode_tiering
    frames_t, n_t = run(replace(tcfg, decode_tiering=True))
    frames_d, n_d = run(tcfg)
    assert n_t == n_d
    np.testing.assert_array_equal(frames_t, frames_d)
