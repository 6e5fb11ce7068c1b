"""PCG-XSH-RR 64/32 parity tests against a pure-Python big-int oracle."""

import numpy as np

from qwen3_tts_tpu.ops import rng

MASK64 = (1 << 64) - 1
MASK32 = (1 << 32) - 1


def oracle_stream(seed: int, n: int):
    """Direct big-int transcription of the reference RNG
    (src/generation/sampling.rs:32-95)."""
    state = (seed * 2685821657736338717 + 1442695040888963407) & MASK64
    outs = []
    for _ in range(n):
        old = state
        state = (old * 6364136223846793005 + 1442695040888963407) & MASK64
        xorshifted = (((old >> 18) ^ old) >> 27) & MASK32
        rot = (old >> 59) & 31
        out = ((xorshifted >> rot) | (xorshifted << (32 - rot))) & MASK32 if rot else xorshifted
        outs.append(out)
    return outs


def test_pcg_words_match_oracle():
    for seed in (0, 1, 42, 12345, 2**63 + 17):
        state = rng.pcg_init_state(seed)
        expected = oracle_stream(seed, 50)
        for i in range(50):
            state, word = rng.pcg_next(state)
            assert int(word) == expected[i], f"seed={seed} draw={i}"


def test_uniform_scaling_matches_f32_division():
    words = oracle_stream(42, 20)
    uniforms = rng.pcg_uniform_sequence(42, 20)
    for w, u in zip(words, uniforms):
        expected = np.float32(np.uint32(w)) / np.float32(np.uint32(0xFFFFFFFF))
        assert u == expected


def test_uniforms_in_range_and_deterministic():
    a = rng.pcg_uniform_sequence(99999, 1000)
    b = rng.pcg_uniform_sequence(99999, 1000)
    assert np.array_equal(a, b)
    assert (a >= 0.0).all() and (a < 1.0).all()
    assert len(np.unique(a)) > 900


def test_different_seeds_differ():
    a = rng.pcg_uniform_sequence(12345, 10)
    b = rng.pcg_uniform_sequence(67890, 10)
    assert not np.array_equal(a, b)
