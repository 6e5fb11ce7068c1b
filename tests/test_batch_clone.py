"""Batched ICL-clone / x-vector-clone / voice-design serving (VERDICT r4 #4).

Parity contract mirrors tests/test_pipeline.py::test_synthesize_batch_matches
_single: each coalesced stream must reproduce its single-stream output —
frame counts exactly, samples bit-exactly against the same decode path
(``synthesize_batch`` and solo non-streaming share the bucketed batch
vocoder; streaming chunks match to matmul-tiling ulps). Reference semantics:
clone path src/lib.rs:897-1046, ICL overrides src/lib.rs:915-929,
proportional cut src/lib.rs:1022-1044 (the reference itself has NO batching).
"""

from dataclasses import replace

import numpy as np
import pytest

from qwen3_tts_tpu import tokens as T
from qwen3_tts_tpu.pipeline import SynthesisOptions, VoiceClonePrompt

from test_pipeline import OPTS, tiny_model
from test_streaming_batch import collect

pytestmark = pytest.mark.slow  # heavy integration tier; `make test-fast` skips



@pytest.fixture(scope="module")
def model():
    return tiny_model()


def xv_prompt(seed: int) -> VoiceClonePrompt:
    return VoiceClonePrompt(
        speaker_embedding=np.random.RandomState(seed).randn(64).astype(np.float32)
    )


def icl_prompt(seed: int, n_ref: int, n_text: int) -> VoiceClonePrompt:
    rs = np.random.RandomState(seed)
    return VoiceClonePrompt(
        speaker_embedding=rs.randn(64).astype(np.float32),
        ref_codes=rs.randint(0, 128, size=(n_ref, 16)).astype(np.int32),
        ref_text_ids=[int(x) for x in rs.randint(3, 50, size=n_text)],
    )


def test_batch_mixed_preset_and_xvector_matches_single(model):
    """Preset speakers and x-vector clones coalesce into ONE vmapped program
    (the speaker-token embedding IS the speaker vector); each stream equals
    its solo run."""
    prompt = xv_prompt(0)
    voices = ["ryan", prompt, "vivian"]
    texts = ["First utterance", "Clone speaks here", "Third preset"]
    batch = model.synthesize_batch(texts, voices, options=OPTS)
    solo0 = model.synthesize_with_voice(texts[0], "ryan", "english", OPTS)
    solo1 = model.synthesize_voice_clone(
        texts[1], prompt, "english", replace(OPTS, seed=OPTS.seed + 1)
    )
    solo2 = model.synthesize_with_voice(
        texts[2], "vivian", "english", replace(OPTS, seed=OPTS.seed + 2)
    )
    for got, want in zip(batch, (solo0, solo1, solo2)):
        assert len(got) == len(want)
        np.testing.assert_array_equal(got.samples, want.samples)


def test_batch_icl_clone_matches_single(model):
    """ICL clones with DIFFERENT reference lengths coalesce; per-stream ref
    rows bucket like text, the proportional cut trims each stream's own
    prefix, and per-stream frame budgets (6/token, min 75) apply."""
    prompts = [icl_prompt(1, 6, 3), icl_prompt(2, 3, 2)]
    texts = ["ICL one speaks", "Two"]
    batch = model.synthesize_batch(texts, prompts, options=OPTS)
    for i, (text, p) in enumerate(zip(texts, prompts)):
        solo, frames = model.synthesize_voice_clone_debug(
            text, p, "english", replace(OPTS, seed=OPTS.seed + i)
        )
        assert len(batch[i]) == frames.shape[0] * T.SAMPLES_PER_FRAME
        np.testing.assert_array_equal(batch[i].samples, solo.samples)


def test_batch_icl_sequential_layout(model):
    prompts = [icl_prompt(3, 5, 2), icl_prompt(4, 4, 3)]
    texts = ["SeqICL a", "SeqICL b"]
    opts = replace(OPTS, icl_sequential=True)
    batch = model.synthesize_batch(texts, prompts, options=opts)
    for i, (text, p) in enumerate(zip(texts, prompts)):
        solo, _ = model.synthesize_voice_clone_debug(
            text, p, "english", replace(opts, seed=opts.seed + i)
        )
        np.testing.assert_array_equal(batch[i].samples, solo.samples)


def test_batch_voice_design_matches_single(model):
    texts = ["Designed voice one", "And two"]
    instructs = ["a deep calm voice", "an excited squeaky narrator"]
    batch = model.synthesize_batch(texts, options=OPTS, instructs=instructs)
    for i, (text, ins) in enumerate(zip(texts, instructs)):
        solo = model.synthesize_voice_design(
            text, ins, "english", replace(OPTS, seed=OPTS.seed + i)
        )
        assert len(batch[i]) == len(solo)
        np.testing.assert_array_equal(batch[i].samples, solo.samples)


def test_batch_mixed_layouts_one_call(model):
    """One synthesize_batch call spanning all three layouts: streams are
    grouped per layout (one vmapped loop each), decoded in ONE vocoder pass,
    and every stream still equals its solo run."""
    prompt = icl_prompt(5, 4, 2)
    texts = ["Preset stream", "ICL stream", "Design stream"]
    speakers = ["ryan", prompt, "ryan"]
    instructs = [None, None, "a whispering voice"]
    batch = model.synthesize_batch(texts, speakers, options=OPTS, instructs=instructs)
    solo0 = model.synthesize_with_voice(texts[0], "ryan", "english", OPTS)
    solo1, _ = model.synthesize_voice_clone_debug(
        texts[1], prompt, "english", replace(OPTS, seed=OPTS.seed + 1)
    )
    solo2 = model.synthesize_voice_design(
        texts[2], instructs[2], "english", replace(OPTS, seed=OPTS.seed + 2)
    )
    for got, want in zip(batch, (solo0, solo1, solo2)):
        np.testing.assert_array_equal(got.samples, want.samples)


def test_streaming_batch_clone_matches_batch(model):
    """Batched streaming ICL clones: per-stream concatenated chunks equal the
    stream's synthesize_batch audio; the reference prefix rides the shared
    vocoder grid and is never emitted."""
    prompts = [icl_prompt(6, 5, 2), icl_prompt(7, 2, 3)]
    texts = ["Stream clone one", "Stream clone two"]
    opts = SynthesisOptions(
        max_length=10, seed=11, chunk_frames=3, first_chunk_frames=2
    )
    streamed, _ = collect(model.synthesize_streaming_batch(texts, prompts, options=opts))
    batch = model.synthesize_batch(texts, prompts, options=opts)
    for i in range(len(texts)):
        assert len(streamed[i]) == len(batch[i]), f"stream {i} sample count"
        np.testing.assert_allclose(
            streamed[i], batch[i].samples, atol=2e-5, rtol=0, err_msg=f"stream {i}"
        )


def test_streaming_batch_xvector_and_preset(model):
    """Basic-layout streaming group: preset + x-vector clone mix."""
    prompt = xv_prompt(8)
    texts = ["Mix one", "Mix two clone"]
    opts = SynthesisOptions(max_length=9, seed=5, chunk_frames=4)
    streamed, _ = collect(
        model.synthesize_streaming_batch(texts, ["ryan", prompt], options=opts)
    )
    batch = model.synthesize_batch(texts, ["ryan", prompt], options=opts)
    for i in range(len(texts)):
        assert len(streamed[i]) == len(batch[i])
        np.testing.assert_allclose(streamed[i], batch[i].samples, atol=2e-5, rtol=0)


def test_streaming_batch_design(model):
    texts = ["Design stream a", "Design stream b"]
    instructs = ["a calm voice", "a bright voice"]
    opts = SynthesisOptions(max_length=9, seed=6, chunk_frames=3)
    streamed, _ = collect(
        model.synthesize_streaming_batch(texts, options=opts, instructs=instructs)
    )
    batch = model.synthesize_batch(texts, options=opts, instructs=instructs)
    for i in range(len(texts)):
        np.testing.assert_allclose(streamed[i], batch[i].samples, atol=2e-5, rtol=0)


def test_streaming_batch_rejects_mixed_layouts(model):
    with pytest.raises(ValueError, match="one prompt layout"):
        model.synthesize_streaming_batch(
            ["a", "b"], ["ryan", icl_prompt(9, 3, 2)], options=OPTS
        )
