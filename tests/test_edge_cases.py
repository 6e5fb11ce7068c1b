"""Edge-case coverage: unseeded mode, invalid names, empty text, option plumbing."""

import numpy as np
import pytest

import tests.test_pipeline as tp
from qwen3_tts_tpu import tokens as T
from qwen3_tts_tpu.pipeline import SynthesisOptions


@pytest.fixture(scope="module")
def model():
    return tp.tiny_model()


def test_unseeded_runs_differ(model):
    """seed=None uses wall-clock entropy; two runs should diverge."""
    opts = SynthesisOptions(max_length=8, seed=None)
    a = model.synthesize_with_voice("entropy", "ryan", "english", opts)
    b = model.synthesize_with_voice("entropy", "ryan", "english", opts)
    assert len(a) != len(b) or not np.array_equal(a.samples, b.samples)


def test_invalid_speaker_and_language(model):
    with pytest.raises(ValueError, match="Unknown speaker"):
        model.synthesize_with_voice("x", "nonexistent", "english", tp.OPTS)
    with pytest.raises(ValueError, match="Unknown language"):
        model.synthesize_with_voice("x", "ryan", "klingon", tp.OPTS)


def test_speaker_language_aliases():
    assert T.speaker_info("UncleFu").token_id == T.speaker_info("uncle_fu").token_id
    assert T.language_token_id("en") == T.language_token_id("English")
    assert T.speaker_info("ryan").native_language == "english"


def test_empty_text_raises(model):
    class EmptyTok:
        def encode(self, text):
            return []

    orig = model.tokenizer
    model.tokenizer = EmptyTok()
    try:
        with pytest.raises(ValueError, match="empty text"):
            model.synthesize_with_voice("", "ryan", "english", tp.OPTS)
    finally:
        model.tokenizer = orig


def test_voice_clone_without_encoder_raises(model):
    from qwen3_tts_tpu.audio.io import AudioBuffer

    with pytest.raises(RuntimeError, match="Speaker encoder not available"):
        model.create_voice_clone_prompt(
            AudioBuffer(np.zeros(2400, np.float32), 24000)
        )


@pytest.mark.slow
def test_options_plumbed_into_generation(model):
    """Different sampling options must change the output (same seed)."""
    a = model.synthesize_with_voice(
        "plumb", "ryan", "english", SynthesisOptions(max_length=8, seed=3, temperature=0.9)
    )
    b = model.synthesize_with_voice(
        "plumb", "ryan", "english",
        SynthesisOptions(max_length=8, seed=3, temperature=0.001),  # greedy
    )
    assert len(a) != len(b) or not np.array_equal(a.samples, b.samples)


def test_max_length_one():
    """Degenerate frame budget still produces exactly one frame."""
    model = tp.tiny_model()
    opts = SynthesisOptions(max_length=1, min_new_tokens=0, seed=5)
    audio, timing = model.synthesize_with_timing("one", "ryan", "english", opts)
    assert timing.generation_frames <= 1
    assert len(audio) == timing.generation_frames * T.SAMPLES_PER_FRAME
