"""Sampling-op parity tests: top-k / top-p / multinomial / penalties."""

import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.models import tokens as T
from qwen3_tts_tpu.ops import sampling


def np_reference_sample(logits, temperature, top_k, top_p, uniform):
    """Numpy transcription of the reference device sampling path
    (src/generation/sampling.rs:140-319) used as the oracle."""
    x = logits.astype(np.float32).copy()
    if temperature != 1.0 and temperature > 0:
        x = x / np.float32(temperature)
    if temperature < 0.01:
        return int(np.argmax(x))
    if top_k > 0:
        k = min(top_k, x.shape[-1])
        thr = np.sort(x)[::-1][k - 1]
        x = np.where(x >= thr, x, -np.inf)
    if 0 < top_p < 1:
        order = np.argsort(-x, kind="stable")
        s = x[order]
        p = np.exp(s - s.max())
        p = p / p.sum()
        cum = np.cumsum(p)
        exclusive = np.concatenate([[0.0], cum[:-1]])
        removed = exclusive >= top_p
        kept = np.where(removed, np.inf, s)
        min_kept = kept.min()
        x = np.where(x >= min_kept, x, -np.inf)
    p = np.exp(x - np.max(x[np.isfinite(x)]))
    p[~np.isfinite(x)] = 0.0
    p = p / p.sum()
    cum = np.cumsum(p)
    hits = np.nonzero(cum >= uniform)[0]
    return int(hits[0]) if len(hits) else len(p) - 1


def test_top_k_keeps_ties():
    logits = jnp.array([[1.0, 5.0, 3.0, 3.0, 4.0]])
    out = np.asarray(sampling.top_k_filter(logits, 3))
    # threshold is the 3rd largest (3.0); both 3.0s survive (tie-inclusive)
    assert np.isfinite(out[0, [1, 2, 3, 4]]).all()
    assert np.isinf(out[0, 0]) and out[0, 0] < 0


def test_top_k_larger_than_vocab():
    logits = jnp.array([[1.0, 2.0, 3.0]])
    out = np.asarray(sampling.top_k_filter(logits, 100))
    np.testing.assert_allclose(out, [[1.0, 2.0, 3.0]])


def test_top_p_dominant_survives():
    logits = jnp.array([[10.0, 0.0, 0.0, 0.0]])
    out = np.asarray(sampling.top_p_filter(logits, 0.9))
    assert out[0, 0] == 10.0
    assert np.isinf(out[0, 1:]).all()


def test_top_p_uniform_keeps_partial():
    logits = jnp.array([[1.0, 1.0, 1.0, 1.0]])
    out = np.asarray(sampling.top_p_filter(logits, 0.5))
    kept = np.isfinite(out).sum()
    assert 2 <= kept <= 4


def test_multinomial_deterministic_prob():
    probs = jnp.array([[0.0, 1.0, 0.0, 0.0]])
    # Note: u = 0.0 would select index 0 (cumsum 0.0 >= 0.0) — that edge case
    # matches the reference's cumsum >= uniform rule (sampling.rs:290-319).
    for u in (1e-6, 0.3, 0.999):
        assert int(sampling.multinomial(probs, jnp.float32(u))[0]) == 1


def test_multinomial_boundaries():
    probs = jnp.array([[0.25, 0.25, 0.25, 0.25]])
    assert int(sampling.multinomial(probs, jnp.float32(0.0))[0]) == 0
    assert int(sampling.multinomial(probs, jnp.float32(0.26))[0]) == 1
    assert int(sampling.multinomial(probs, jnp.float32(0.75))[0]) == 2
    assert int(sampling.multinomial(probs, jnp.float32(0.76))[0]) == 3


def test_sample_matches_numpy_oracle():
    rs = np.random.RandomState(0)
    cfg = sampling.SamplingConfig(temperature=0.9, top_k=50, top_p=0.9)
    for trial in range(30):
        logits = rs.randn(3072).astype(np.float32) * 3
        u = rs.rand()
        got = int(sampling.sample(jnp.asarray(logits)[None], cfg, jnp.float32(u))[0])
        want = np_reference_sample(logits, 0.9, 50, 0.9, np.float32(u))
        assert got == want, f"trial {trial}: {got} != {want}"


def test_greedy_low_temperature():
    cfg = sampling.SamplingConfig(temperature=0.001)
    logits = jnp.array([[1.0, 10.0, 2.0]])
    assert int(sampling.sample(logits, cfg, jnp.float32(0.9))[0]) == 1


def test_repetition_penalty_math():
    logits = jnp.array([[2.0, 3.0, -2.0, 4.0]])
    mask = jnp.array([1.0, 0.0, 1.0, 0.0])
    out = np.asarray(sampling.apply_repetition_penalty(logits, mask, 2.0))
    np.testing.assert_allclose(out, [[1.0, 3.0, -4.0, 4.0]])


def test_repetition_penalty_noop_at_one():
    logits = jnp.array([[2.0, 3.0]])
    mask = jnp.array([1.0, 1.0])
    out = np.asarray(sampling.apply_repetition_penalty(logits, mask, 1.0))
    np.testing.assert_allclose(out, [[2.0, 3.0]])


def test_suppression_mask_range():
    mask = np.asarray(sampling.build_suppression_mask())
    assert mask.shape == (3072,)
    assert not mask[:2048].any()
    assert mask[2048:].sum() == 1024 - 1  # all control tokens except EOS
    assert not mask[T.CODEC_EOS]


def test_min_new_tokens_blocks_eos():
    cfg = sampling.SamplingConfig(min_new_tokens=2)
    vocab = 3072
    logits = jnp.zeros((1, vocab))
    supp = sampling.build_suppression_mask(vocab, cfg.eos_token_id)
    pmask = jnp.zeros((vocab,))
    blocked = np.asarray(
        sampling.apply_generation_penalties(logits, pmask, supp, cfg, jnp.int32(0))
    )
    allowed = np.asarray(
        sampling.apply_generation_penalties(logits, pmask, supp, cfg, jnp.int32(2))
    )
    assert np.isinf(blocked[0, T.CODEC_EOS]) and blocked[0, T.CODEC_EOS] < 0
    assert allowed[0, T.CODEC_EOS] == 0.0
    # control range except EOS always suppressed
    assert np.isinf(allowed[0, 2048:2150]).all()
